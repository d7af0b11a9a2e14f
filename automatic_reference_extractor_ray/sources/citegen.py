"""Deterministic citation-string generation with known ground-truth
fields (FIXTURES.md: "templated citations … so the field tokenizer has
deterministic ground truth").

Forty-eight template shapes (T1-T48 below), matching the shapes
``functions.fields.parse_fields`` recognizes exactly; the generator
returns both the raw string and the expected BibStructured field dict,
so field extraction has an analytic oracle that never calls the parser.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..functions.fields import EMPTY_FIELDS

SURNAMES = ["Miller", "Schmidt", "Tanaka", "Okafor", "Novak", "Silva",
            "Weber", "Ivanov", "Larsen", "Moreau", "Haddad", "Kim",
            "Olsen", "Petrov", "Garcia", "Nguyen"]
INITIALS = list("ABCDEFGHJKLMPRST")
TITLE_WORDS = ["adaptive", "spectral", "methods", "for", "sparse", "graph",
               "inference", "neural", "retrieval", "of", "historical",
               "records", "streaming", "analysis", "over", "large", "corpora",
               "robust", "segmentation", "in", "scanned", "documents",
               "automated", "citation", "extraction", "with", "layout",
               "models", "distributed", "processing", "pipelines"]
JOURNALS = ["Journal of Document Analysis", "Information Processing Letters",
            "Computational Linguistics Review", "Archive Science Quarterly",
            "Data Engineering Bulletin"]
PUBLISHERS = ["Springer", "Elsevier", "Academic Press", "MIT Press",
              "Cambridge Press"]
CITIES = ["Berlin", "Boston", "Tokyo", "Oslo", "Madrid", "Leiden"]
CONF_TOPICS = ["Document Analysis", "Web Search", "Data Engineering",
               "Digital Libraries", "Information Retrieval"]
# organizational authors (T25) — last word is a recognizable
# institution noun (functions.fields._ORG_SUFFIXES)
ORGS = ["World Health Organization", "National Archives Council",
        "International Records Institute", "Federal Statistics Bureau",
        "European Documentation Centre"]
# fully-spelled forenames for the Chicago inverted-name shapes
# (T26/T27): "Miller, Anne" — dotless, must stay ONE author
FORENAMES = ["Anne", "Ben", "Chika", "Dana", "Emil", "Farah",
             "Grete", "Hiro"]
# diacritic / apostrophe surnames (T42) — the Unicode hardening
# proof: every name regex in functions/fields.py must treat these
# exactly like the ASCII pool (\w-class patterns, not [A-Z])
SURNAMES_INTL = ["Müller", "Señor", "O'Brien", "Çelik", "Dvořák",
                 "François", "Søndergaard", "Ångström",
                 "Иванов", "田中"]  # Cyrillic + CJK: full-Unicode pin
NEWSPAPERS = ["City Herald", "Daily Record", "Morning Post",
              "Evening Standard", "The Archive Times"]
MON3 = ["Jan", "Feb", "Mar", "Apr", "May", "Jun", "Jul", "Aug",
        "Sep", "Oct", "Nov", "Dec"]
BODY_WORDS = ["the", "proposed", "approach", "combines", "structural",
              "features", "and", "lexical", "cues", "to", "identify",
              "reference", "regions", "within", "noisy", "page", "text",
              "while", "remaining", "fully", "deterministic", "under",
              "parallel", "execution", "across", "many", "workers"]


@dataclass
class Citation:
    raw: str
    fields: dict


def _pick(rng: np.random.Generator, pool: list[str]) -> str:
    return pool[int(rng.integers(0, len(pool)))]


def _title(rng: np.random.Generator) -> str:
    n = int(rng.integers(3, 7))
    words = [_pick(rng, TITLE_WORDS) for _ in range(n)]
    words[0] = words[0].capitalize()
    return " ".join(words)


def _author(rng: np.random.Generator) -> str:
    return f"{_pick(rng, SURNAMES)}, {_pick(rng, INITIALS)}."


def _author_mid(rng: np.random.Generator) -> str:
    """Forename first + middle initial (TEI forename type=first/middle,
    LOCDB-V3/imgProcessing.py:816-846)."""
    return (f"{_pick(rng, SURNAMES)}, {_pick(rng, INITIALS)}. "
            f"{_pick(rng, INITIALS)}.")


MONTHS = ["January", "February", "March", "April", "May", "June", "July",
          "August", "September", "October", "November", "December"]


def gen_citation(rng: np.random.Generator) -> Citation:
    """One deterministic citation; template mix (M12 shape coverage):

      0,1  T1 journal article (1-2 authors, "A. and B.")
      2    T2 book
      3    T3 surname-style
      4    T4 journal article, 3-author comma list ("A., B., and C.")
      5    T5 editor book ("Last, A. (ed.) ..."): the TEI mapper reads
           <author> tags only, so ground-truth authors are EMPTY
      6    T6 journal article, from-only page (biblScope unit="page")
      7    T7 journal article, volume but no issue
      8    T8 journal article with middle-initial forenames
           (TEI forename type=first + type=middle)
      9    T9 chapter in an edited volume ("In: Ed (ed.), Book, ...")
           — chapter title is level a and wins; the book title is
           level m and is DROPPED (journal comes only from level j)
      10   T10 month-carrying date ("(1999, March)") — the mapped
           date is the full when-style value "1999-03" (the TEI
           mapper stores date@when verbatim,
           LOCDB-V3/imgProcessing.py:889-894)
      11   T11 forename-first author rendering ("A. Miller") — the
           TEI mapper's own forename+surname join order
           (imgProcessing.py:816-846) arriving as input
      12   T12 bare-surname comma list ("Miller, Schmidt, and
           Tanaka") — commas as list separators, not inversions
      13   T13 monograph without an imprint ("Last, A. (2001).
           Title.") — title level m fallback, no journal marker
      14   T14 page-marker from-only page ("..., 12(3), p. 45.") —
           the other surface form of biblScope unit="page"
      15   T15 APA ampersand author list ("Miller, A., Schmidt, B., &
           Tanaka, C.") — "&" as the final-name separator
      16   T16 marker-prefixed page range ("..., 12(3), pp. 45-67." or
           the European "S. 45-67") — biblScope from/to under another
           surface form
      17   T17 quoted title ('... (1999). "Title". Journal, ...') —
           quotes are surface decoration, the mapped title drops them
      18   T18 "et al." author list ("Miller, A., et al. (1999) ...")
           — the unnamed tail produces NO <author> tags, so truth
           keeps only the named lead author(s)
      19   T19 trailing DOI ("..., 45-67. doi:10.NNNN/..." or a
           doi.org URL) — Grobid maps it to <idno>, which the TEI
           field mapper never reads (imgProcessing.py:801-968), so
           the mapped fields are T1's and the identifier drops
      20   T20 conference paper ("... In Proceedings of the 5th
           Conference on X, pages 45-67.") — the proceedings name is
           the monogr's level-m title and DROPS (same rule as T9's
           book title); pages map as usual
      21   T21 trailing retrieval URL ("... Retrieved from
           http://...") — Grobid's <ptr target>, never read by the
           mapper; stripped like a DOI tail
      22   T22 Vancouver/NLM ("Miller A, Schmidt B. Title. Journal.
           1999;12(3):45-67.") — dotless "Surname AB" author tokens,
           year after the journal; same TEI field set as T1
      23   T23 IEEE ('A. Miller, "Title," Journal, vol. 12, no. 3,
           pp. 45-67, 1999.') — quoted title keeps its comma inside
           the quotes; vol./no./pp. markers; year last
      24   T24 APA edited-book chapter ("... In E. Editor (Ed.),
           Book title (pp. 45-67). Publisher.") — chapter title
           (level a) wins, book title (level m) DROPS, the editor
           maps to no <author>
      25   T25 organizational author ("World Health Organization.
           (2020). ...") — Grobid tags an orgName author, whose
           forename/surname-only name join renders as ONE EMPTY
           author string (imgProcessing.py:816-846): ground truth
           is [""] — present but empty, unlike T5's absent editors
      26   T26 Chicago bibliography article ('Miller, Anne. "Title."
           Journal 12, no. 3 (1999): 45-67.') — fully-spelled
           inverted single author, quoted title with its period
           inside the quotes (both drop)
      27   T27 Chicago bibliography book ("Miller, Anne. Title.
           Boston: MIT Press, 1999.") — "City: Publisher, year."
           imprint, pubPlace before publisher
      28   T28 Harvard ("Miller, A. (1999) 'Title', Journal, 12(3),
           pp. 45-67.") — year paren WITHOUT a trailing period,
           single-quoted title (quotes drop); mapped fields are T1's
      29   T29 thesis ("Miller, A. (1999). Title. PhD thesis,
           University of X.") — Grobid notes the degree and puts the
           awarding institution OUTSIDE the imprint (no <publisher>),
           and the mapper reads imprint children only, so the whole
           thesis tail DROPS: mapped fields are T13's
      30   T30 arXiv preprint ("... Title. arXiv preprint
           arXiv:1501.12345.") — the identifier is TEI <idno>, never
           read by the mapper; stripped like a DOI tail, leaving T13
      31   T31 MLA article ('Miller, Anne. "Title." Journal, vol. 12,
           no. 3, 1999, pp. 45-67.') — inverted full-name single
           author, quoted title with its period inside, vol./no.
           markers in a comma run, year mid-list
      32   T32 edition/report parenthetical book ("... Title
           (2nd ed.). Publisher, City." or "... (Tech. Rep. No. 42).
           ...") — TEI <edition>/<note>, which the mapper never
           reads, so the parenthetical drops and the rest maps as T2
      33   T33 German journal article ("Schmidt, A.; Meier, B.:
           Titel. In: Zeitschrift 12 (1999), Nr. 3, S. 45-67.") —
           colon after the author head, semicolon author separators,
           volume before the parenthesized year, Nr./S. markers
           (the LOC-DB project's own bibliographic tradition)
      34   T34 Springer LNCS ("Schmidt, A.: Title. In: Proceedings
           of the 5th Conference on X, pp. 45-67. Springer, Berlin
           (1999).") — proceedings name is level m and DROPS (the
           T9/T20 rule); publisher/place map; year trails in parens
      35   T35 Nature style ("Smith, J. & Jones, B. Title. Journal
           12, 45-67 (1999).") — authors lead with NO year, "&"
           separator, no issue, pages before the parenthesized year
      36   T36 CSE name-year ("Smith J, Jones B. 1999. Title.
           Journal 12(3):45-67.") — dotless author tokens (the
           Vancouver convention) but the year right after the author
           head, colon pages
      37   T37 ACS ("Smith, A. B.; Jones, C. Title. Journal 1999,
           12, 45-67.") — semicolon list of inverted initialed
           names, the year BETWEEN journal and volume
      38   T38 APS letters ("A. Smith and B. Jones, Journal 12,
           4567 (1999).") — NO TITLE, forename-first "and" list,
           from-only page, trailing parenthesized year
      39   T39 ACM reference format ("Anne Smith and Ben Jones.
           1999. Title. In Proceedings of the 5th Conference on X.
           Publisher, City, 45-67.") — full dotless names, year
           after the head, proceedings name (level m) drops
      42   T42 international names ("Müller, A. and O'Brien, B.
           (1999). ...") — T1's journal shape over diacritic /
           apostrophe surnames: the Unicode-cleanliness proof for
           the whole author chain (no [A-Z]-anchored regex survives
           this pool)
      43   T43 APA 7 ("Miller, A., Schmidt, B., & Weber, C. (1999).
           Title. Journal, 12(3), 45-67. https://doi.org/10.N/x.")
           — the ampersand list COMBINED with the bare doi.org tail
           (no "doi:" prefix, no "Retrieved from"); identifier
           strips, mapped fields are T15's
      44   T44 APA no-date ("Miller, A. (n.d.). ...") over the
           T1/T2/T13 shapes — Grobid emits NO <date> for "(n.d.)",
           so the mapped date is EMPTY
      45   T45 newspaper ('Miller, Anne. "Title." City Herald,
           12 Mar. 1999, p. 4.') — single inverted full name stays
           ONE author, in-quote title period drops, the
           day-month-year maps as the FULL when value "1999-03-12",
           from-only page
      46   T46 software ("Org. (2020). Name (Version 3.8) [Computer
           software].") — orgName author → ONE EMPTY author string
           (T25), version/marker/URL tail all drop
      47   T47 patent ("... Title. U.S. Patent No. 5,123,456.") —
           the number is an <idno> (never read), mapped fields T13's
      48   T48 numbered report ("... Title (Report No. 42).
           Publisher.") — parenthetical drops (TEI <note>),
           city-less imprint maps publisher only
    """
    t = int(rng.integers(0, 49))
    year = str(int(rng.integers(1970, 2024)))
    title = _title(rng)
    f = dict(EMPTY_FIELDS)
    f["title"] = title
    f["date"] = year

    def journal_bits():
        return (_pick(rng, JOURNALS), str(int(rng.integers(1, 60))),
                str(int(rng.integers(1, 13))), int(rng.integers(1, 400)))

    if t <= 1:  # T1 journal article
        authors = [_author(rng) for _ in range(int(rng.integers(1, 3)))]
        journal, vol, iss, p1 = journal_bits()
        p2 = p1 + int(rng.integers(2, 40))
        raw = (f"{' and '.join(authors)} ({year}). {title}. {journal}, "
               f"{vol}({iss}), {p1}-{p2}.")
        f.update(authors=authors, journal=journal, volume=vol, issue=iss,
                 pages=f"{p1}-{p2}")
    elif t == 2:  # T2 book
        authors = [_author(rng)]
        publisher = _pick(rng, PUBLISHERS)
        city = _pick(rng, CITIES)
        raw = f"{authors[0]} ({year}). {title}. {publisher}, {city}."
        f.update(authors=authors, publisher=publisher, location=city)
    elif t == 3:  # T3 surname-style
        authors = [_pick(rng, SURNAMES) for _ in range(int(rng.integers(1, 3)))]
        journal, vol, _, p1 = journal_bits()
        p2 = p1 + int(rng.integers(2, 40))
        raw = (f"{' and '.join(authors)}. {title}. {journal} "
               f"{vol}:{p1}-{p2}, {year}.")
        f.update(authors=authors, journal=journal, volume=vol,
                 pages=f"{p1}-{p2}")
    elif t == 4:  # T4 three-author comma list
        authors = [_author(rng) for _ in range(3)]
        journal, vol, iss, p1 = journal_bits()
        p2 = p1 + int(rng.integers(2, 40))
        raw = (f"{authors[0]}, {authors[1]}, and {authors[2]} ({year}). "
               f"{title}. {journal}, {vol}({iss}), {p1}-{p2}.")
        f.update(authors=authors, journal=journal, volume=vol, issue=iss,
                 pages=f"{p1}-{p2}")
    elif t == 5:  # T5 editor book — editors are NOT authors (TEI mapper)
        editor = _author(rng)
        publisher = _pick(rng, PUBLISHERS)
        city = _pick(rng, CITIES)
        raw = f"{editor} (ed.) ({year}). {title}. {publisher}, {city}."
        f.update(publisher=publisher, location=city)     # authors stay []
    elif t == 6:  # T6 from-only page
        authors = [_author(rng)]
        journal, vol, iss, p1 = journal_bits()
        raw = (f"{authors[0]} ({year}). {title}. {journal}, "
               f"{vol}({iss}), {p1}.")
        f.update(authors=authors, journal=journal, volume=vol, issue=iss,
                 pages=str(p1))
    elif t == 7:  # T7 no-issue journal
        authors = [_author(rng) for _ in range(int(rng.integers(1, 3)))]
        journal, vol, _, p1 = journal_bits()
        p2 = p1 + int(rng.integers(2, 40))
        raw = (f"{' and '.join(authors)} ({year}). {title}. {journal}, "
               f"{vol}, {p1}-{p2}.")
        f.update(authors=authors, journal=journal, volume=vol,
                 pages=f"{p1}-{p2}")
    elif t == 8:  # T8 middle-initial forenames
        authors = [_author_mid(rng) for _ in range(int(rng.integers(1, 3)))]
        journal, vol, iss, p1 = journal_bits()
        p2 = p1 + int(rng.integers(2, 40))
        raw = (f"{' and '.join(authors)} ({year}). {title}. {journal}, "
               f"{vol}({iss}), {p1}-{p2}.")
        f.update(authors=authors, journal=journal, volume=vol, issue=iss,
                 pages=f"{p1}-{p2}")
    elif t == 9:  # T9 chapter in an edited volume
        authors = [_author(rng)]
        editor = _author(rng)
        book = _title(rng)
        publisher = _pick(rng, PUBLISHERS)
        city = _pick(rng, CITIES)
        p1 = int(rng.integers(1, 400))
        p2 = p1 + int(rng.integers(2, 40))
        raw = (f"{authors[0]} ({year}). {title}. In: {editor} (ed.), "
               f"{book}, {publisher}, {city}, {p1}-{p2}.")
        # book title (level m) dropped; editors ignored
        f.update(authors=authors, publisher=publisher, location=city,
                 pages=f"{p1}-{p2}")
    elif t == 10:  # T10 month-carrying date — full when-style value
        authors = [_author(rng)]
        journal, vol, iss, p1 = journal_bits()
        p2 = p1 + int(rng.integers(2, 40))
        month = _pick(rng, MONTHS)
        raw = (f"{authors[0]} ({year}, {month}). {title}. {journal}, "
               f"{vol}({iss}), {p1}-{p2}.")
        f.update(authors=authors, journal=journal, volume=vol, issue=iss,
                 pages=f"{p1}-{p2}",
                 date=f"{year}-{MONTHS.index(month) + 1:02d}")
    elif t == 11:  # T11 forename-first authors ("A. Miller")
        authors = [f"{_pick(rng, INITIALS)}. {_pick(rng, SURNAMES)}"
                   for _ in range(int(rng.integers(1, 3)))]
        journal, vol, iss, p1 = journal_bits()
        p2 = p1 + int(rng.integers(2, 40))
        raw = (f"{' and '.join(authors)} ({year}). {title}. {journal}, "
               f"{vol}({iss}), {p1}-{p2}.")
        f.update(authors=authors, journal=journal, volume=vol, issue=iss,
                 pages=f"{p1}-{p2}")
    elif t == 12:  # T12 bare-surname comma list
        authors = [_pick(rng, SURNAMES) for _ in range(3)]
        journal, vol, iss, p1 = journal_bits()
        p2 = p1 + int(rng.integers(2, 40))
        raw = (f"{authors[0]}, {authors[1]}, and {authors[2]} ({year}). "
               f"{title}. {journal}, {vol}({iss}), {p1}-{p2}.")
        f.update(authors=authors, journal=journal, volume=vol, issue=iss,
                 pages=f"{p1}-{p2}")
    elif t == 13:  # T13 monograph without an imprint
        authors = [_author(rng)]
        raw = f"{authors[0]} ({year}). {title}."
        f.update(authors=authors)
    elif t == 14:  # T14 page-marker from-only page
        authors = [_author(rng)]
        journal, vol, iss, p1 = journal_bits()
        raw = (f"{authors[0]} ({year}). {title}. {journal}, "
               f"{vol}({iss}), p. {p1}.")
        f.update(authors=authors, journal=journal, volume=vol, issue=iss,
                 pages=str(p1))
    elif t == 15:  # T15 APA "&"-joined author list
        authors = [_author(rng) for _ in range(3)]
        journal, vol, iss, p1 = journal_bits()
        p2 = p1 + int(rng.integers(2, 40))
        raw = (f"{authors[0]}, {authors[1]}, & {authors[2]} ({year}). "
               f"{title}. {journal}, {vol}({iss}), {p1}-{p2}.")
        f.update(authors=authors, journal=journal, volume=vol, issue=iss,
                 pages=f"{p1}-{p2}")
    elif t == 16:  # T16 "pp."/"S." page-range marker
        authors = [_author(rng)]
        journal, vol, iss, p1 = journal_bits()
        p2 = p1 + int(rng.integers(2, 40))
        marker = "pp." if int(rng.integers(0, 2)) else "S."
        raw = (f"{authors[0]} ({year}). {title}. {journal}, "
               f"{vol}({iss}), {marker} {p1}-{p2}.")
        f.update(authors=authors, journal=journal, volume=vol, issue=iss,
                 pages=f"{p1}-{p2}")
    elif t == 17:  # T17 quoted title (mapped title drops the quotes)
        authors = [_author(rng)]
        journal, vol, iss, p1 = journal_bits()
        p2 = p1 + int(rng.integers(2, 40))
        raw = (f'{authors[0]} ({year}). "{title}". {journal}, '
               f"{vol}({iss}), {p1}-{p2}.")
        f.update(authors=authors, journal=journal, volume=vol, issue=iss,
                 pages=f"{p1}-{p2}")
    elif t == 18:  # T18 "et al." list — only the NAMED authors map
        named = [_author(rng) for _ in range(int(rng.integers(1, 3)))]
        journal, vol, iss, p1 = journal_bits()
        p2 = p1 + int(rng.integers(2, 40))
        raw = (f"{', '.join(named)}, et al. ({year}). {title}. {journal}, "
               f"{vol}({iss}), {p1}-{p2}.")
        f.update(authors=named, journal=journal, volume=vol, issue=iss,
                 pages=f"{p1}-{p2}")
    elif t == 19:  # T19 trailing DOI — the identifier is TEI <idno>,
        # which the reference mapper never reads: mapped fields are T1's
        authors = [_author(rng)]
        journal, vol, iss, p1 = journal_bits()
        p2 = p1 + int(rng.integers(2, 40))
        slug = int(rng.integers(1000, 10000))
        doi = (f"doi:10.{slug}/jda.{year}.{vol}"
               if int(rng.integers(0, 2))
               else f"https://doi.org/10.{slug}/jda.{year}.{vol}")
        raw = (f"{authors[0]} ({year}). {title}. {journal}, "
               f"{vol}({iss}), {p1}-{p2}. {doi}.")
        f.update(authors=authors, journal=journal, volume=vol, issue=iss,
                 pages=f"{p1}-{p2}")
    elif t == 20:  # T20 conference paper — proceedings name drops
        authors = [_author(rng)]
        nth = int(rng.integers(4, 21))            # 4th..20th: all "th"
        conf = (f"the {nth}th Conference on "
                f"{_pick(rng, CONF_TOPICS)}")
        p1 = int(rng.integers(1, 400))
        p2 = p1 + int(rng.integers(2, 40))
        raw = (f"{authors[0]} ({year}). {title}. In Proceedings of "
               f"{conf}, pages {p1}-{p2}.")
        f.update(authors=authors, pages=f"{p1}-{p2}")
    elif t == 21:  # T21 trailing retrieval URL — <ptr target>, unmapped
        authors = [_author(rng)]
        journal, vol, iss, p1 = journal_bits()
        p2 = p1 + int(rng.integers(2, 40))
        slug = int(rng.integers(100, 1000))
        marker = ("Retrieved from" if int(rng.integers(0, 2))
                  else "Available at:")
        raw = (f"{authors[0]} ({year}). {title}. {journal}, "
               f"{vol}({iss}), {p1}-{p2}. {marker} "
               f"http://archive.example.org/p/{slug}.")
        f.update(authors=authors, journal=journal, volume=vol, issue=iss,
                 pages=f"{p1}-{p2}")
    elif t == 22:  # T22 Vancouver/NLM — "Surname AB" tokens, year
        # after the journal, ;vol(iss):pages run
        n = int(rng.integers(1, 4))
        authors = [f"{_pick(rng, SURNAMES)} {_pick(rng, INITIALS)}"
                   for _ in range(n)]
        journal, vol, iss, p1 = journal_bits()
        p2 = p1 + int(rng.integers(2, 40))
        raw = (f"{', '.join(authors)}. {title}. {journal}. "
               f"{year};{vol}({iss}):{p1}-{p2}.")
        f.update(authors=authors, journal=journal, volume=vol, issue=iss,
                 pages=f"{p1}-{p2}")
    elif t == 23:  # T23 IEEE — forename-first list, quoted title with
        # its comma inside the quotes, vol./no./pp. markers, year last
        n = int(rng.integers(1, 4))
        authors = [f"{_pick(rng, INITIALS)}. {_pick(rng, SURNAMES)}"
                   for _ in range(n)]
        if n == 1:
            alist = authors[0]
        elif n == 2:
            alist = f"{authors[0]} and {authors[1]}"
        else:
            alist = f"{authors[0]}, {authors[1]}, and {authors[2]}"
        journal, vol, iss, p1 = journal_bits()
        p2 = p1 + int(rng.integers(2, 40))
        raw = (f'{alist}, "{title}," {journal}, vol. {vol}, '
               f"no. {iss}, pp. {p1}-{p2}, {year}.")
        f.update(authors=authors, journal=journal, volume=vol, issue=iss,
                 pages=f"{p1}-{p2}")
    elif t == 24:  # T24 APA edited-book chapter — book title (level m)
        # drops, editor maps to no <author>
        authors = [_author(rng)]
        editor = f"{_pick(rng, INITIALS)}. {_pick(rng, SURNAMES)}"
        book = _title(rng)
        publisher = _pick(rng, PUBLISHERS)
        p1 = int(rng.integers(1, 400))
        p2 = p1 + int(rng.integers(2, 40))
        raw = (f"{authors[0]} ({year}). {title}. In {editor} (Ed.), "
               f"{book} (pp. {p1}-{p2}). {publisher}.")
        f.update(authors=authors, publisher=publisher, pages=f"{p1}-{p2}")
    elif t == 25:  # T25 organizational author — the orgName author
        # joins to ONE EMPTY name string (imgProcessing.py:816-846
        # reads forename/surname children only)
        org = _pick(rng, ORGS)
        publisher = _pick(rng, PUBLISHERS)
        city = _pick(rng, CITIES)
        raw = f"{org}. ({year}). {title}. {publisher}, {city}."
        f.update(authors=[""], publisher=publisher, location=city)
    elif t == 26:  # T26 Chicago article — inverted full name stays
        # ONE author; quoted title drops quotes + in-quote period
        authors = [f"{_pick(rng, SURNAMES)}, {_pick(rng, FORENAMES)}"]
        journal, vol, iss, p1 = journal_bits()
        p2 = p1 + int(rng.integers(2, 40))
        raw = (f'{authors[0]}. "{title}." {journal} {vol}, '
               f"no. {iss} ({year}): {p1}-{p2}.")
        f.update(authors=authors, journal=journal, volume=vol, issue=iss,
                 pages=f"{p1}-{p2}")
    elif t == 27:  # T27 Chicago book — "City: Publisher, year." imprint
        authors = [f"{_pick(rng, SURNAMES)}, {_pick(rng, FORENAMES)}"]
        publisher = _pick(rng, PUBLISHERS)
        city = _pick(rng, CITIES)
        raw = f"{authors[0]}. {title}. {city}: {publisher}, {year}."
        f.update(authors=authors, publisher=publisher, location=city)
    elif t == 28:  # T28 Harvard — periodless year paren, single-quoted
        # title; mapped fields are T1's (quotes drop)
        authors = [_author(rng)]
        journal, vol, iss, p1 = journal_bits()
        p2 = p1 + int(rng.integers(2, 40))
        raw = (f"{authors[0]} ({year}) '{title}', {journal}, "
               f"{vol}({iss}), pp. {p1}-{p2}.")
        f.update(authors=authors, journal=journal, volume=vol, issue=iss,
                 pages=f"{p1}-{p2}")
    elif t == 29:  # T29 thesis — the degree note and the awarding
        # institution sit outside the imprint in Grobid's TEI, so the
        # whole tail drops: mapped fields are T13's
        authors = [_author(rng)]
        degree = "PhD" if int(rng.integers(0, 2)) else "Master's"
        inst = f"University of {_pick(rng, CITIES)}"
        raw = f"{authors[0]} ({year}). {title}. {degree} thesis, {inst}."
        f.update(authors=authors)
    elif t == 30:  # T30 arXiv preprint — <idno>, stripped like a DOI
        authors = [_author(rng)]
        aid = (f"arXiv:{int(rng.integers(1000, 2400))}."
               f"{int(rng.integers(10000, 100000))}")
        raw = f"{authors[0]} ({year}). {title}. arXiv preprint {aid}."
        f.update(authors=authors)
    elif t == 31:  # T31 MLA article — inverted full-name author,
        # quoted title (period inside), vol./no. comma run, year
        # mid-list
        authors = [f"{_pick(rng, SURNAMES)}, {_pick(rng, FORENAMES)}"]
        journal, vol, iss, p1 = journal_bits()
        p2 = p1 + int(rng.integers(2, 40))
        raw = (f'{authors[0]}. "{title}." {journal}, vol. {vol}, '
               f"no. {iss}, {year}, pp. {p1}-{p2}.")
        f.update(authors=authors, journal=journal, volume=vol, issue=iss,
                 pages=f"{p1}-{p2}")
    elif t == 32:  # T32 edition/report parenthetical book — the
        # parenthetical is TEI <edition>/<note>, never read: it drops
        authors = [_author(rng)]
        publisher = _pick(rng, PUBLISHERS)
        city = _pick(rng, CITIES)
        if int(rng.integers(0, 2)):
            n = int(rng.integers(2, 6))
            suffix = {2: "nd", 3: "rd"}.get(n, "th")
            par = f"{n}{suffix} ed."
        else:
            par = f"Tech. Rep. No. {int(rng.integers(1, 200))}"
        raw = (f"{authors[0]} ({year}). {title} ({par}). "
               f"{publisher}, {city}.")
        f.update(authors=authors, publisher=publisher, location=city)
    elif t == 33:  # T33 German journal article — colon author head,
        # semicolon author list, "In:" journal, Nr./S. markers
        authors = [_author(rng) for _ in range(int(rng.integers(1, 3)))]
        journal, vol, iss, p1 = journal_bits()
        p2 = p1 + int(rng.integers(2, 40))
        raw = (f"{'; '.join(authors)}: {title}. In: {journal} {vol} "
               f"({year}), Nr. {iss}, S. {p1}-{p2}.")
        f.update(authors=authors, journal=journal, volume=vol, issue=iss,
                 pages=f"{p1}-{p2}")
    elif t == 34:  # T34 Springer LNCS — proceedings title (level m)
        # drops, publisher/place map, trailing parenthesized year
        authors = [_author(rng)]
        nth = int(rng.integers(4, 21))
        conf = f"the {nth}th Conference on {_pick(rng, CONF_TOPICS)}"
        publisher = _pick(rng, PUBLISHERS)
        city = _pick(rng, CITIES)
        p1 = int(rng.integers(1, 400))
        p2 = p1 + int(rng.integers(2, 40))
        raw = (f"{authors[0]}: {title}. In: Proceedings of {conf}, "
               f"pp. {p1}-{p2}. {publisher}, {city} ({year}).")
        f.update(authors=authors, publisher=publisher, location=city,
                 pages=f"{p1}-{p2}")
    elif t == 35:  # T35 Nature style — "&" list, no issue, pages
        # before the parenthesized year
        authors = [_author(rng) for _ in range(int(rng.integers(1, 3)))]
        journal, vol, _, p1 = journal_bits()
        p2 = p1 + int(rng.integers(2, 40))
        raw = (f"{' & '.join(authors)} {title}. {journal} {vol}, "
               f"{p1}-{p2} ({year}).")
        f.update(authors=authors, journal=journal, volume=vol,
                 pages=f"{p1}-{p2}")
    elif t == 36:  # T36 CSE name-year — dotless author tokens, year
        # right after the author head, colon pages
        n = int(rng.integers(1, 4))
        authors = [f"{_pick(rng, SURNAMES)} {_pick(rng, INITIALS)}"
                   for _ in range(n)]
        journal, vol, iss, p1 = journal_bits()
        p2 = p1 + int(rng.integers(2, 40))
        raw = (f"{', '.join(authors)}. {year}. {title}. {journal} "
               f"{vol}({iss}):{p1}-{p2}.")
        f.update(authors=authors, journal=journal, volume=vol, issue=iss,
                 pages=f"{p1}-{p2}")
    elif t == 37:  # T37 ACS — semicolon list of inverted initialed
        # names, year BETWEEN journal and volume
        n = int(rng.integers(1, 4))
        authors = []
        for _ in range(n):
            ini = f"{_pick(rng, INITIALS)}."
            if rng.integers(0, 2):
                ini += f" {_pick(rng, INITIALS)}."
            authors.append(f"{_pick(rng, SURNAMES)}, {ini}")
        journal, vol, _, p1 = journal_bits()
        p2 = p1 + int(rng.integers(2, 40))
        raw = (f"{'; '.join(authors)} {title}. {journal} {year}, "
               f"{vol}, {p1}-{p2}.")
        f.update(authors=authors, journal=journal, volume=vol,
                 pages=f"{p1}-{p2}")
    elif t == 38:  # T38 APS letters — NO TITLE, forename-first "and"
        # list, from-only page, trailing paren year
        n = int(rng.integers(1, 3))
        authors = [f"{_pick(rng, INITIALS)}. {_pick(rng, SURNAMES)}"
                   for _ in range(n)]
        journal, vol, _, p1 = journal_bits()
        raw = (f"{' and '.join(authors)}, {journal} {vol}, "
               f"{p1} ({year}).")
        f.update(authors=authors, journal=journal, volume=vol,
                 pages=str(p1), title="")
    elif t == 40:  # T40 GB/T 7714 journal article — dotless author
        # tokens (T36's), the "[J]" document-type marker after the
        # title (drops), year after the journal, vol(iss): colon pages
        n = int(rng.integers(1, 4))
        authors = [f"{_pick(rng, SURNAMES)} {_pick(rng, INITIALS)}"
                   for _ in range(n)]
        journal, vol, iss, p1 = journal_bits()
        p2 = p1 + int(rng.integers(2, 40))
        raw = (f"{', '.join(authors)}. {title}[J]. {journal}, "
               f"{year}, {vol}({iss}): {p1}-{p2}.")
        f.update(authors=authors, journal=journal, volume=vol, issue=iss,
                 pages=f"{p1}-{p2}")
    elif t == 41:  # T41 raw BibTeX @article — pasted-source long
        # tail; inverted full names joined " and " stay one author
        # each (the T26 convention), "--" page dashes normalize, the
        # cite key and braces drop; "number" may be absent
        n = int(rng.integers(1, 3))
        authors = [f"{_pick(rng, SURNAMES)}, {_pick(rng, FORENAMES)}"
                   for _ in range(n)]
        journal, vol, iss, p1 = journal_bits()
        p2 = p1 + int(rng.integers(2, 40))
        key = f"{authors[0].split(',')[0].lower()}{year}"
        num = f" number = {{{iss}}}," if int(rng.integers(0, 2)) else ""
        # the terminal "." after the closing braces keeps the
        # every-template-ends-with-a-dot invariant the HTML selector
        # families strip-and-restore (corpus.py _html_dl/_pll_doc)
        raw = (f"@article{{{key}, author = {{{' and '.join(authors)}}}, "
               f"title = {{{title}}}, journal = {{{journal}}}, "
               f"year = {{{year}}}, volume = {{{vol}}},{num} "
               f"pages = {{{p1}--{p2}}}}}.")
        f.update(authors=authors, journal=journal, volume=vol,
                 issue=iss if num else "", pages=f"{p1}-{p2}")
    elif t == 42:  # T42 international names — T1's journal shape with
        # diacritic / apostrophe surnames ("Müller, A. and O'Brien,
        # B. ..."): proves the whole author chain (split, inversion,
        # near-dup keys, XML/HTML roundtrip) is Unicode-clean, not
        # [A-Z]-anchored
        authors = [f"{_pick(rng, SURNAMES_INTL)}, {_pick(rng, INITIALS)}."
                   for _ in range(int(rng.integers(1, 3)))]
        journal, vol, iss, p1 = journal_bits()
        p2 = p1 + int(rng.integers(2, 40))
        raw = (f"{' and '.join(authors)} ({year}). {title}. {journal}, "
               f"{vol}({iss}), {p1}-{p2}.")
        f.update(authors=authors, journal=journal, volume=vol, issue=iss,
                 pages=f"{p1}-{p2}")
    elif t == 44:  # T44 APA no-date "(n.d.)" over the T1/T2/T13
        # shapes — Grobid emits NO <date> for it, so truth date is
        # EMPTY (functions.fields._date_of)
        sub = int(rng.integers(0, 3))
        authors = [_author(rng)]
        f["date"] = ""
        if sub == 0:
            journal, vol, iss, p1 = journal_bits()
            p2 = p1 + int(rng.integers(2, 40))
            raw = (f"{authors[0]} (n.d.). {title}. {journal}, "
                   f"{vol}({iss}), {p1}-{p2}.")
            f.update(authors=authors, journal=journal, volume=vol,
                     issue=iss, pages=f"{p1}-{p2}")
        elif sub == 1:
            publisher = _pick(rng, PUBLISHERS)
            city = _pick(rng, CITIES)
            raw = f"{authors[0]} (n.d.). {title}. {publisher}, {city}."
            f.update(authors=authors, publisher=publisher,
                     location=city)
        else:
            raw = f"{authors[0]} (n.d.). {title}."
            f.update(authors=authors)
    elif t == 45:  # T45 newspaper article — single inverted full
        # name (stays ONE author, the T26 convention), quoted title
        # (in-quote period drops), day-month-year maps as the FULL
        # when value, from-only page
        author = f"{_pick(rng, SURNAMES)}, {_pick(rng, FORENAMES)}"
        paper = _pick(rng, NEWSPAPERS)
        day = int(rng.integers(1, 29))
        mi = int(rng.integers(0, 12))
        p1 = int(rng.integers(1, 40))
        raw = (f"{author}. \"{title}.\" {paper}, {day} {MON3[mi]}. "
               f"{year}, p. {p1}.")
        f.update(authors=[author], journal=paper,
                 date=f"{year}-{mi + 1:02d}-{day:02d}", pages=str(p1))
    elif t == 46:  # T46 software citation — org author renders as ONE
        # EMPTY author (the T25 orgName convention); the version
        # parenthetical and [Computer software] marker drop
        org = _pick(rng, ORGS)
        name = _pick(rng, TITLE_WORDS).capitalize()
        ver = f"{int(rng.integers(1, 9))}.{int(rng.integers(0, 12))}"
        raw = (f"{org}. ({year}). {name} (Version {ver}) "
               f"[Computer software].")
        f.update(authors=[""], title=name)
    elif t == 47:  # T47 patent — the number is an <idno>, dropped
        # like a DOI tail; mapped fields are T13's
        authors = [_author(rng)]
        num = (f"{int(rng.integers(4, 9))},"
               f"{int(rng.integers(0, 999)):03d},"
               f"{int(rng.integers(0, 999)):03d}")
        raw = f"{authors[0]} ({year}). {title}. U.S. Patent No. {num}."
        f.update(authors=authors)
    elif t == 48:  # T48 numbered report — the report-number
        # parenthetical drops (TEI <note>), city-less imprint maps
        # publisher only
        authors = [_author(rng)]
        publisher = _pick(rng, PUBLISHERS)
        rn = int(rng.integers(1, 99))
        raw = (f"{authors[0]} ({year}). {title} (Report No. {rn}). "
               f"{publisher}.")
        f.update(authors=authors, publisher=publisher)
    elif t == 43:  # T43 APA 7 — T15's ampersand author list with the
        # bare "https://doi.org/10.N/..." tail (no "doi:" prefix, no
        # "Retrieved from"): the modern APA DOI form; the identifier
        # strips (Grobid <idno> never read), mapped fields are T15's
        authors = [_author(rng) for _ in range(3)]
        journal, vol, iss, p1 = journal_bits()
        p2 = p1 + int(rng.integers(2, 40))
        doi = (f"https://doi.org/10.{int(rng.integers(1000, 9999))}/"
               f"j{int(rng.integers(100, 999))}")
        raw = (f"{authors[0]}, {authors[1]}, & {authors[2]} ({year}). "
               f"{title}. {journal}, {vol}({iss}), {p1}-{p2}. {doi}.")
        f.update(authors=authors, journal=journal, volume=vol, issue=iss,
                 pages=f"{p1}-{p2}")
    else:  # T39 ACM reference format — full dotless names, year after
        # the head, proceedings name (level m) drops, publisher/place/
        # pages map
        n = int(rng.integers(1, 3))
        authors = [f"{_pick(rng, FORENAMES)} {_pick(rng, SURNAMES)}"
                   for _ in range(n)]
        nth = int(rng.integers(4, 21))
        conf = f"the {nth}th Conference on {_pick(rng, CONF_TOPICS)}"
        publisher = _pick(rng, PUBLISHERS)
        city = _pick(rng, CITIES)
        p1 = int(rng.integers(1, 400))
        p2 = p1 + int(rng.integers(2, 40))
        raw = (f"{' and '.join(authors)}. {year}. {title}. "
               f"In Proceedings of {conf}. {publisher}, {city}, "
               f"{p1}-{p2}.")
        f.update(authors=authors, publisher=publisher, location=city,
                 pages=f"{p1}-{p2}")
    return Citation(raw=raw, fields=f)


def gen_body_sentence(rng: np.random.Generator) -> str:
    """Filler prose: no year patterns, no leading numbering, single
    spaces — guaranteed not to look like a reference."""
    n = int(rng.integers(6, 14))
    words = [_pick(rng, BODY_WORDS) for _ in range(n)]
    words[0] = words[0].capitalize()
    return " ".join(words) + "."
