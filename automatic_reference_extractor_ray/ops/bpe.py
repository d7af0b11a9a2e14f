"""Byte-pair-encoding subword vocabulary: corpus fit + tokenization.

The tokenizer-training step of an LLM data pipeline (Sennrich et al.
2016, "Neural Machine Translation of Rare Words with Subword Units"):
learn a merge table from corpus word frequencies, then tokenize every
document with it.  The classic algorithm needs only the (word, count)
table — not the corpus — so the distributed part is exactly the
bounded word-count cut this repo already uses everywhere, and the
merge loop runs driver-local over a FIXED-SIZE table (the
kmeans / fit_logreg / fit_bigram_lm bounded-fit contract: fit cost is
independent of corpus size).

Shape:
- **fit** streams per-batch word-count partials through one bucketed
  exchange, cuts the top ``max_words`` per bucket (count DESC, word
  ASC — each word lives in exactly one hash bucket, so the union of
  per-bucket cuts contains the exact global top), folds ≤
  buckets×max_words candidate rows on the driver, and runs the
  textbook merge loop: repeatedly merge the most frequent adjacent
  symbol pair (ties broken by the lexicographically smallest pair) —
  fully deterministic and bucket-count invariant.
- **tokenize** broadcasts the rank table once (``ray.put``, read per
  task) and encodes each batch's UNIQUE words exactly once (per-batch
  dict cache; word frequency follows Zipf, so unique-word work is a
  small fraction of token volume), then distributes counts back to
  rows vectorized.

Words longer than ``max_word_len`` chars are excluded from the FIT
table (a single pathological megabyte-long "word" would dominate the
merge loop) but still tokenize fine at encode time — they just decay
to characters plus whatever merges apply.

No SQL oracle (the iterative merge loop is not reasonably expressible
in DuckDB): the pytest suite pins fit + encode against an independent
pure-Python reference implementation, and property-tests bucket-count
invariance and the compression monotonicity of the merge count.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .analytics import TOKEN_RE
from .shuffle import bucketed_groupby

END_OF_WORD = "</w>"


# ------------------------------------------------------------ fit

def _word_counts(docs, max_words: int, min_count: int,
                 max_word_len: int, text_col: str,
                 num_buckets: int | None) -> pd.DataFrame:
    """Exact global top-``max_words`` (word, count) table via per-batch
    Counter partials + one word-bucketed exchange + per-bucket cuts."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter
        c: Counter = Counter()
        for t in b[text_col].to_numpy():
            c.update(w for w in TOKEN_RE.findall((t or "").lower())
                     if len(w) <= max_word_len)
        return pd.DataFrame({
            "word": np.array(list(c.keys()), dtype=object),
            "n": np.fromiter(c.values(), np.int64, len(c))})

    def cut(pdf: pd.DataFrame) -> pd.DataFrame:
        g = pdf.groupby("word", sort=False)["n"].sum().reset_index()
        g = g[g["n"] >= min_count]
        return g.sort_values(["n", "word"],
                             ascending=[False, True]).head(max_words)

    cand = bucketed_groupby(
        docs.map_batches(partial, batch_format="pandas"),
        "word", cut, num_buckets).to_pandas()
    if cand.empty:
        return pd.DataFrame({"word": pd.Series([], dtype=object),
                             "n": pd.Series([], dtype="int64")})
    return cand.sort_values(["n", "word"],
                            ascending=[False, True]).head(max_words)


def _merge_loop(words: list[str], counts: np.ndarray,
                n_merges: int) -> list[tuple[str, str]]:
    """Driver-local textbook BPE over the bounded (word, count) table.

    Incremental pair-count maintenance: only words containing the
    just-merged pair are re-counted, and the argmax comes off a LAZY
    max-heap (stale entries validated against the live count on pop),
    so the loop is O(n_merges × affected-word symbols × log heap),
    not O(n_merges × pair-table)."""
    import heapq
    from collections import Counter, defaultdict

    seqs = [tuple(w) + (END_OF_WORD,) for w in words]
    pair_n: Counter = Counter()
    pair_words: defaultdict[tuple, set] = defaultdict(set)
    for i, seq in enumerate(seqs):
        c = int(counts[i])
        for p in zip(seq[:-1], seq[1:]):
            pair_n[p] += c
            pair_words[p].add(i)
    # heap orders by (-count, pair): max count first, ties by the
    # lexicographically smallest pair — deterministic
    heap = [(-n, p) for p, n in pair_n.items()]
    heapq.heapify(heap)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        best = None
        while heap:
            negn, p = heapq.heappop(heap)
            if pair_n.get(p) == -negn:      # live entry, not stale
                best = p
                break
        if best is None:
            break
        merges.append(best)
        merged = best[0] + best[1]
        for i in sorted(pair_words[best]):
            seq = seqs[i]
            c = int(counts[i])
            touched = set()
            for p in zip(seq[:-1], seq[1:]):
                pair_n[p] -= c
                touched.add(p)
                if pair_n[p] <= 0:
                    del pair_n[p]
                ws = pair_words.get(p)
                if ws is not None:
                    ws.discard(i)
                    if not ws:
                        del pair_words[p]
            new: list[str] = []
            j = 0
            while j < len(seq):
                if (j < len(seq) - 1 and seq[j] == best[0]
                        and seq[j + 1] == best[1]):
                    new.append(merged)
                    j += 2
                else:
                    new.append(seq[j])
                    j += 1
            seqs[i] = tuple(new)
            for p in zip(seqs[i][:-1], seqs[i][1:]):
                pair_n[p] += c
                pair_words[p].add(i)
                touched.add(p)
            for p in touched:
                n = pair_n.get(p)
                if n:
                    heapq.heappush(heap, (-n, p))
    return merges


def fit_bpe(docs, n_merges: int = 4096, max_words: int = 32768,
            min_count: int = 2, max_word_len: int = 64,
            text_col: str = "text",
            num_buckets: int | None = None) -> dict:
    """Learn a BPE merge table from the corpus.

    Returns ``{"merges": [(a, b), ...], "ranks": {(a, b): rank}}``.
    The vocabulary is implicit: single characters + ``END_OF_WORD`` +
    one ``a+b`` symbol per merge.  Deterministic for a given corpus
    regardless of row order, block layout, or bucket count."""
    wc = _word_counts(docs, max_words, min_count, max_word_len,
                      text_col, num_buckets)
    merges = _merge_loop(list(wc["word"]), wc["n"].to_numpy(np.int64),
                         n_merges)
    return {"merges": merges,
            "ranks": {p: r for r, p in enumerate(merges)}}


# ------------------------------------------------------------ encode

def encode_word(word: str, ranks: dict) -> list[str]:
    """Tokenize one word: start from characters + ``END_OF_WORD``,
    repeatedly apply the LOWEST-rank applicable merge (the standard
    BPE inference order, which reproduces training exactly for words
    the fit saw)."""
    seq = list(word) + [END_OF_WORD]
    while len(seq) > 1:
        best_rank, best_j = None, -1
        for j in range(len(seq) - 1):
            r = ranks.get((seq[j], seq[j + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_j = r, j
        if best_rank is None:
            break
        # merge EVERY occurrence of the chosen pair left-to-right
        pair = (seq[best_j], seq[best_j + 1])
        new: list[str] = []
        j = 0
        while j < len(seq):
            if (j < len(seq) - 1 and seq[j] == pair[0]
                    and seq[j + 1] == pair[1]):
                new.append(pair[0] + pair[1])
                j += 2
            else:
                new.append(seq[j])
                j += 1
        seq = new
    return seq


def bpe_tokenize(docs, model: dict | None = None,
                 text_col: str = "text", id_col: str = "doc_id",
                 **fit_kwargs):
    """Per-document BPE token statistics.

    Fits a model first when one isn't supplied (``fit_kwargs`` pass
    through to :func:`fit_bpe`).  The rank table broadcasts once via
    ``ray.put``; each batch encodes its unique words once and maps
    counts back vectorized.

    Returns a Dataset ``(doc_id, n_words, n_chars, n_tokens)`` where
    ``n_chars`` counts the pre-merge symbol stream (word lengths +
    one end-of-word per word) — ``n_tokens / n_chars`` is the
    compression the learned vocabulary achieves.
    """
    import ray

    if model is None:
        model = fit_bpe(docs, text_col=text_col, **fit_kwargs)
    ranks_ref = ray.put(model["ranks"])

    def fn(b: pd.DataFrame) -> pd.DataFrame:
        ranks = ray.get(ranks_ref)
        cache: dict[str, int] = {}
        n_words = np.zeros(len(b), dtype=np.int64)
        n_chars = np.zeros(len(b), dtype=np.int64)
        n_tokens = np.zeros(len(b), dtype=np.int64)
        for i, t in enumerate(b[text_col].to_numpy()):
            words = TOKEN_RE.findall((t or "").lower())
            n_words[i] = len(words)
            tot_c = tot_t = 0
            for w in words:
                tot_c += len(w) + 1
                nt = cache.get(w)
                if nt is None:
                    nt = cache[w] = len(encode_word(w, ranks))
                tot_t += nt
            n_chars[i] = tot_c
            n_tokens[i] = tot_t
        return pd.DataFrame({id_col: b[id_col].to_numpy(),
                             "n_words": n_words, "n_chars": n_chars,
                             "n_tokens": n_tokens})

    return docs.map_batches(fn, batch_format="pandas")
