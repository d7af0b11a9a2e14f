"""Pin the hyphenation/char-index math byte-for-byte
(LOCDB-V3/imgProcessing.py:487-527) with hand-computed expectations."""

from automatic_reference_extractor_ray.functions.textkit import (
    collapse_ws, concat_lines_with_index, coords_to_str, join_lines_repaired,
    repair_line, split_versioned_doc_id)


def test_repair_plain_line_appends_space():
    assert repair_line("hello") == ("hello ", 6)


def test_repair_letter_hyphen_dropped():
    assert repair_line("exam-") == ("exam", 4)


def test_repair_digit_hyphen_kept():
    # page-number heuristic: "123-" keeps the hyphen, length unchanged
    assert repair_line("123-") == ("123-", 4)


def test_repair_lone_hyphen_dropped():
    assert repair_line("-") == ("", 0)


def test_concat_index_hand_case():
    # "abc" (+space, L=4), "de-" (drop, L=2), "fg" (+space, L=3)
    text, ranges = concat_lines_with_index(["abc", "de-", "fg"])
    assert text == "abc defg "
    # reference bounds: prev=-1; [prev+1, prev+L]
    assert ranges == [(0, 3), (4, 5), (6, 8)]


def test_concat_index_digit_hyphen():
    text, ranges = concat_lines_with_index(["45-", "67"])
    assert text == "45-67 "
    assert ranges == [(0, 2), (3, 5)]


def test_join_lines_repaired():
    assert join_lines_repaired(["exam-", "ple text"]) == "example text"
    assert join_lines_repaired(["a b", "c"]) == "a b c"


def test_collapse_ws():
    assert collapse_ws("  a\n\tb   c ") == "a b c"


def test_coords_codec():
    assert coords_to_str((1, 2, 3, 4)) == "1 2 3 4"


def test_versioned_split():
    assert split_versioned_doc_id("doc-1~7") == ("doc-1", 7)
    assert split_versioned_doc_id("doc-1") == ("doc-1", 0)
    assert split_versioned_doc_id("a~b") == ("a~b", 0)


# ---- property tests (SURVEY.md §7: M4 char-index math under random lines)

from hypothesis import given, settings
from hypothesis import strategies as st

_line = st.text(alphabet="ab1 -", min_size=0, max_size=12)


@settings(max_examples=300, deadline=None)
@given(st.lists(_line, min_size=1, max_size=8))
def test_concat_index_invariants(lines):
    text, ranges = concat_lines_with_index(lines)
    assert len(ranges) == len(lines)
    # full text is exactly the concatenation of the repaired lines
    repaired = [repair_line(ln) for ln in lines]
    assert text == "".join(r for r, _ in repaired)
    # ranges are the reference's inclusive [prev+1, prev+L] chain:
    # contiguous from 0, each length == the repaired line length
    prev = -1
    for (s, e), (_, L) in zip(ranges, repaired):
        assert s == prev + 1
        assert e == prev + L
        prev = e
    # the indexed slice recovers each repaired line (end inclusive)
    for (s, e), (r, L) in zip(ranges, repaired):
        assert text[s:e + 1] == r


@settings(max_examples=300, deadline=None)
@given(st.lists(_line, min_size=1, max_size=8))
def test_join_repaired_equals_concat(lines):
    # join_lines_repaired == concat text minus its trailing join
    # space(s) — the two implementations must never drift
    text, _ = concat_lines_with_index(lines)
    assert join_lines_repaired(lines) == text.rstrip(" ")


def test_natsort_key_orders_naturally():
    from automatic_reference_extractor_ray.functions.textkit import natsort_key
    names = ["doc10", "doc2", "doc1", "doc2-r3", "doc2-r10"]
    assert sorted(names, key=natsort_key) == \
        ["doc1", "doc2", "doc2-r3", "doc2-r10", "doc10"]
    # runs longer than any fixed pad (13+ digits, e.g. 14-digit
    # YYYYMMDDHHMMSS prefixes) still order numerically
    long = ["d999999999999", "d1000000000000", "d20240101120000",
            "d9999999999999"]
    assert sorted(long, key=natsort_key) == [
        "d999999999999", "d1000000000000", "d9999999999999",
        "d20240101120000"]


def test_repair_title_line_m10():
    from automatic_reference_extractor_ray.functions.textkit import (
        repair_title_line)
    # pdf-inspector "title|first line" → keep the second segment
    assert repair_title_line("Wrong Title|Real first line\nbody\n") == \
        "Real first line\nbody\n"
    # no pipe → untouched
    assert repair_title_line("Plain first\nbody") == "Plain first\nbody"
    # quirk: >2 segments keep segment [1] WITHOUT its newline, so the
    # next line concatenates (readlines/write round-trip parity)
    assert repair_title_line("a|b|c\nnext\n") == "bnext\n"
    assert repair_title_line("") == ""
