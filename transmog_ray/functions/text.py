"""Text analysis stages: token counting, quality scoring, language ID,
document fingerprinting.

All are vectorized-or-cheap per-batch transforms designed for
``map_batches``; definitions are chosen to be exactly reproducible in
ANSI SQL (DuckDB) so the driver's oracle can pin them — except the
language-ID heuristic, which has no reasonable SQL form (rows-only check).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

STOPWORDS = ("the", "a", "and", "of", "to")

# per-language function-word profiles for the stopword heuristic (latin
# scripts; non-latin scripts are detected by unicode range instead)
_LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "in", "is", "you", "that", "it", "for",
           "was", "with", "are", "this", "have"},
    "de": {"der", "die", "und", "das", "ist", "nicht", "mit", "ein", "ich",
           "zu", "den", "von", "auf", "sich", "auch"},
    "fr": {"le", "la", "et", "les", "des", "est", "pas", "que", "une",
           "dans", "pour", "qui", "sur", "vous", "nous"},
    "es": {"el", "que", "de", "los", "es", "una", "por", "con", "para",
           "las", "del", "se", "su", "como", "más"},
    "it": {"il", "di", "che", "e", "la", "per", "un", "del", "non", "sono",
           "nel", "della", "con", "gli", "anche"},
    "pt": {"o", "de", "que", "e", "do", "da", "em", "um", "para", "com",
           "não", "uma", "os", "são", "mais"},
    "nl": {"de", "het", "een", "van", "en", "in", "is", "dat", "op", "te",
           "zijn", "voor", "met", "niet", "aan"},
}

# unicode script ranges → language guess when that script dominates
_SCRIPTS = (
    ("zh", r"[一-鿿]"),
    ("ja", r"[぀-ヿ]"),   # kana beats han for ja text
    ("ko", r"[가-힯]"),
    ("ru", r"[Ѐ-ӿ]"),
    ("ar", r"[؀-ۿ]"),
    ("el", r"[Ͱ-Ͽ]"),
    ("he", r"[֐-׿]"),
)


def token_stats(df: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """``n_tokens`` = single-space split count (== DuckDB
    ``len(string_split(text, ' '))``), ``n_chars_computed`` = length."""
    s = df[text_col].fillna("")
    df["n_tokens"] = (s.str.count(" ") + 1).astype("int64")
    df["n_chars_computed"] = s.str.len().astype("int64")
    return df


def token_stats_arrow(t, text_col: str = "text"):
    """Arrow-native :func:`token_stats` (same counts, zero-copy batch):
    ``count_substring`` + ``utf8_length`` kernels straight on the Arrow
    column — no pandas round-trip for this pure map stage."""
    import pyarrow as pa
    import pyarrow.compute as pc

    s = pc.fill_null(t[text_col], "")
    n_tokens = pc.cast(pc.add(pc.count_substring(s, " "), 1), pa.int64())
    n_chars = pc.cast(pc.utf8_length(s), pa.int64())
    return t.append_column("n_tokens", n_tokens).append_column(
        "n_chars_computed", n_chars
    )


#: BPE-ish pre-tokenizer pattern (GPT-2 style, simplified to the common
#: RE2 subset — no lookahead — so DuckDB regexp_extract_all reproduces
#: the count exactly): letter runs, digit runs, punctuation runs, each
#: with an optional leading space.
BPE_PATTERN = r" ?[A-Za-z]+| ?[0-9]+| ?[^ A-Za-z0-9]+"


class BpeTokenCount:
    """Regex token counter as an actor-pool stage: the pattern compiles
    ONCE per actor in ``__init__`` (stateful-stage contract), each call
    adds ``n_bpe_tokens`` via one ``str.count`` pass over the batch."""

    def __init__(self, text_col: str = "text", pattern: str = BPE_PATTERN):
        import re

        self.text_col = text_col
        self.pattern = re.compile(pattern)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        s = df[self.text_col].fillna("")
        df["n_bpe_tokens"] = s.str.count(self.pattern).astype("int64")
        return df


def quality_score(df: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """Length/word/stopword quality signals, SQL-reproducible:

    * ``n_words``  — single-space token count
    * ``mean_word_len`` — (chars - spaces) / words (exact float64 ratio —
      identical on both sides, so no rounding)
    * ``stopword_ratio`` — tokens ∈ STOPWORDS / words
    """
    s = df[text_col].fillna("")
    n_words = (s.str.count(" ") + 1).astype("int64")
    n_chars = s.str.len()
    n_spaces = s.str.count(" ")
    df["n_words"] = n_words
    df["mean_word_len"] = (n_chars - n_spaces) / n_words
    # count only exact single-space tokens to mirror the SQL list_filter
    stop_counts = s.str.split(" ").map(
        lambda ws: sum(1 for w in ws if w in STOPWORDS)
    )
    df["stopword_ratio"] = stop_counts / n_words
    return df


def repetition_stats(
    df: pd.DataFrame, id_col: str = "doc_id", text_col: str = "text",
) -> pd.DataFrame:
    """Gopher-style repetition signals over word bigrams, per document:

    * ``n_bigrams`` — total bigram occurrences (tokens - 1)
    * ``top_bigram_frac`` — occurrences of the most frequent bigram / total
    * ``dup_bigram_frac`` — occurrences whose bigram appears ≥ 2× / total

    High values flag boilerplate / machine-generated repetition (the
    Gopher quality-filter family). Tokenization is a single-space split
    (DuckDB ``string_split(text, ' ')``) so the fractions — exact
    integer-ratio float64 divisions — reproduce bit-identically in SQL.
    Documents with fewer than two tokens emit no row (they have no
    bigrams), matching the SQL inner self-join. Fully vectorized: explode
    + within-doc shift builds bigrams, two groupbys aggregate them; each
    document is independent, so this runs embarrassingly parallel in
    ``map_batches``.
    """
    import numpy as np

    toks = df[text_col].fillna("").str.split(" ")
    ex = toks.explode()
    nxt = ex.groupby(level=0).shift(-1)
    mask = nxt.notna()
    bg = ex[mask] + " " + nxt[mask]
    if bg.empty:
        return pd.DataFrame({
            id_col: pd.Series([], dtype=df[id_col].dtype),
            "n_bigrams": pd.Series([], dtype="int64"),
            "top_bigram_frac": pd.Series([], dtype="float64"),
            "dup_bigram_frac": pd.Series([], dtype="float64"),
        })
    pairs = pd.DataFrame({
        id_col: df[id_col].loc[bg.index].to_numpy(),
        "bg": bg.to_numpy(),
    })
    c = pairs.groupby([id_col, "bg"], sort=False).size().reset_index(name="c")
    c["dup"] = np.where(c["c"] >= 2, c["c"], 0)
    agg = (
        c.groupby(id_col, sort=False)
        .agg(n_bigrams=("c", "sum"), max_c=("c", "max"), dup_c=("dup", "sum"))
        .reset_index()
    )
    agg["top_bigram_frac"] = agg["max_c"] / agg["n_bigrams"]
    agg["dup_bigram_frac"] = agg["dup_c"] / agg["n_bigrams"]
    agg["n_bigrams"] = agg["n_bigrams"].astype("int64")
    return agg[[id_col, "n_bigrams", "top_bigram_frac", "dup_bigram_frac"]]


def gopher_rules(
    df: pd.DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 30,
    max_words: int = 90,
    max_mean_word_len: float = 4.6,
    min_stop_distinct: int = 2,
    max_dup_bigram_frac: float = 0.08,
) -> pd.DataFrame:
    """Gopher-style document quality gate (Rae et al. 2021 §A1.1 family,
    re-parameterized for the fixture corpus): word-count bounds, mean
    word length bound, a minimum number of DISTINCT stopwords, and a
    duplicate-bigram-mass bound. Emits the per-rule signals plus
    ``keep`` (1/0) so downstream filtering and audits share one pass.

    Every signal is an exact count or integer-ratio float64 — the whole
    gate reproduces bit-identically in ANSI SQL. Per-document and
    map-only: zero shuffle at any corpus size.
    """
    import numpy as np

    s = df[text_col].fillna("")
    n_words = (s.str.count(" ") + 1).astype("int64")
    n_chars = s.str.len()
    n_spaces = s.str.count(" ")
    mean_word_len = (n_chars - n_spaces) / n_words
    stop_distinct = s.str.split(" ").map(
        lambda ws: len(set(w for w in ws if w in STOPWORDS))
    ).astype("int64")
    rep = repetition_stats(df, id_col=id_col, text_col=text_col)
    out = pd.DataFrame(
        {
            id_col: df[id_col].to_numpy(),
            "n_words": n_words.to_numpy(),
            "mean_word_len": mean_word_len.to_numpy(),
            "n_stop_distinct": stop_distinct.to_numpy(),
        }
    )
    out = out.merge(
        rep[[id_col, "dup_bigram_frac"]], on=id_col, how="left"
    )
    # a doc with < 2 tokens has no bigrams → repetition can't disqualify
    out["dup_bigram_frac"] = out["dup_bigram_frac"].fillna(0.0)
    out["keep"] = (
        (out["n_words"] >= min_words)
        & (out["n_words"] <= max_words)
        & (out["mean_word_len"] <= max_mean_word_len)
        & (out["n_stop_distinct"] >= min_stop_distinct)
        & (out["dup_bigram_frac"] <= max_dup_bigram_frac)
    ).astype("int64")
    return out


def word_ngrams(
    df: pd.DataFrame, n: int, id_col: str = "doc_id", text_col: str = "text",
) -> pd.DataFrame:
    """All word *n*-gram occurrences per document as ``(id, g)`` rows
    (duplicates preserved). Vectorized: one explode, then ``n-1``
    within-doc shifts build each gram — no per-row Python. Documents
    with fewer than *n* tokens emit nothing. Tokenization is the
    single-space split shared with :func:`token_stats` so DuckDB
    ``string_split(text, ' ')`` + list slicing reproduces it exactly."""
    toks = df[text_col].fillna("").str.split(" ")
    ex = toks.explode()
    grp = ex.groupby(level=0)
    parts = [ex]
    for i in range(1, n):
        parts.append(grp.shift(-i))
    mask = parts[-1].notna()
    g = parts[0][mask]
    for p in parts[1:]:
        g = g + " " + p[mask]
    return pd.DataFrame({
        id_col: df[id_col].loc[g.index].to_numpy(),
        "g": g.to_numpy(),
    })


def ngram_contamination(
    docs_ds,
    eval_grams: frozenset,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Benchmark-contamination check: for every document, the fraction of
    its DISTINCT word *n*-grams that appear in a broadcast evaluation
    set (the standard decontamination primitive for training corpora —
    e.g. 13-gram overlap vs. held-out benchmarks).

    ``eval_grams`` is built once on the driver (benchmark suites are
    small by contract) and ships to workers inside the task closure via
    the object store — read once per task, never per batch. Per batch:
    vectorized n-gram build, per-doc distinct, C-level set membership
    (``Series.isin``), one groupby. Embarrassingly parallel — no
    shuffle at all. Documents with fewer than *n* tokens emit no row
    (they have no n-grams), matching the SQL inner form.

    Output: ``id, n_grams`` (distinct), ``n_contam`` (distinct ∩ eval),
    ``contam_frac`` — an exact integer-ratio float64, bit-identical in
    SQL."""

    def per_batch(df: pd.DataFrame) -> pd.DataFrame:
        pairs = word_ngrams(df, n, id_col, text_col)
        if pairs.empty:
            return pd.DataFrame({
                id_col: pd.Series([], dtype=df[id_col].dtype),
                "n_grams": pd.Series([], dtype="int64"),
                "n_contam": pd.Series([], dtype="int64"),
                "contam_frac": pd.Series([], dtype="float64"),
            })
        d = pairs.drop_duplicates()
        d["hit"] = d["g"].isin(eval_grams).astype("int64")
        out = (
            d.groupby(id_col, sort=False)
            .agg(n_grams=("g", "size"), n_contam=("hit", "sum"))
            .reset_index()
        )
        out["n_grams"] = out["n_grams"].astype("int64")
        out["n_contam"] = out["n_contam"].astype("int64")
        out["contam_frac"] = out["n_contam"] / out["n_grams"]
        return out

    return docs_ds.map_batches(per_batch, batch_format="pandas")


def tfidf_topk(
    docs_ds,
    n_docs: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    decimals: int = 6,
):
    """Top-*k* TF-IDF terms per document, fully distributed:

    1. per-batch (doc, term, tf) pairs — documents never span batches, so
       one vectorized explode+groupby per batch yields EXACT tf;
    2. document frequency per term via the partial-agg combine (each
       (doc, term) pair appears once, so summing per-batch pair counts IS
       the distinct-doc count — no distinct shuffle needed);
    3. a partitioned hash join on ``term`` attaches df (both sides stay
       distributed — the vocabulary of a web corpus does not fit one
       node);
    4. ``tfidf = tf · ln(N/df)``, then per-doc top-k in one bucket pass
       (sort by unrounded score desc, term asc — the tiebreak makes exact
       ties deterministic; scores are rounded only for OUTPUT).

    Three exchanges total; raw text never shuffles, only (doc, term, tf)
    triples. ``n_docs`` is passed in (one cheap ``count()``) rather than
    re-derived."""
    import numpy as np

    from ..functions.relational import grouped_agg, hash_join
    from ..stages.partition import bucket_exchange
    from ..pipelines.queries import round_half_away

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        ex = df[text_col].fillna("").str.split(" ").explode()
        t = pd.DataFrame({
            id_col: df[id_col].loc[ex.index].to_numpy(),
            "term": ex.to_numpy(dtype=object),
        })
        tf = t.groupby([id_col, "term"], sort=False).size().reset_index(name="tf")
        tf["tf"] = tf["tf"].astype("int64")
        return tf

    tf_pairs = docs_ds.map_batches(pairs, batch_format="pandas").materialize()
    dfreq = grouped_agg(
        tf_pairs.map_batches(
            lambda d: d.assign(df=np.int64(1))[["term", "df"]],
            batch_format="pandas",
        ),
        ["term"], {"df": ("df", "sum")},
    )
    scored = hash_join(tf_pairs, dfreq, on="term")

    def topk_per_doc(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(
            tfidf=df["tf"].to_numpy(np.float64)
            * np.log(float(n_docs) / df["df"].to_numpy(np.float64))
        )
        df = df.sort_values([id_col, "tfidf", "term"],
                            ascending=[True, False, True], kind="mergesort")
        out = df.groupby(id_col, sort=False).head(k).copy()
        out["tfidf"] = round_half_away(out["tfidf"], decimals)
        return out[[id_col, "term", "tfidf"]]

    return bucket_exchange(scored, [id_col], topk_per_doc)


# PII patterns deliberately restricted to the RE2-compatible subset
# (no lookaround/backrefs) so the SAME pattern strings run verbatim in
# DuckDB regexp_replace(..., 'g') for the oracle. Order matters:
# emails first (their digits would otherwise feed the phone pattern),
# then IPs, then phones.
PII_PATTERNS = (
    ("[EMAIL]", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("[IP]", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
    ("[PHONE]", r"\+\d[\d -]{6,}\d"),
)


def redact_pii(
    df: pd.DataFrame,
    text_col: str = "text",
    out_col: str | None = None,
    patterns=PII_PATTERNS,
) -> pd.DataFrame:
    """Replace emails / IPv4s / phone numbers with bracket tokens —
    vectorized ``Series.str.replace`` sweeps (one compiled regex pass per
    kind, no per-row Python). Sequential non-overlapping left-to-right
    substitution matches DuckDB's ``regexp_replace(..., 'g')`` exactly,
    so the op is oracle-checkable on synthetic PII."""
    s = df[text_col].fillna("")
    for token, pat in patterns:
        s = s.str.replace(pat, token, regex=True)
    df[out_col or text_col] = s
    return df


def dup_ngram_fraction(
    ds,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int | None = None,
):
    """Corpus-level duplicate-n-gram fraction per document (the Lee et
    al. *Deduplicating Training Data* signal): the share of a doc's
    n-gram OCCURRENCES whose gram appears ≥ 2 times anywhere in the
    corpus — high values mark boilerplate and templated spam that
    exact-doc dedup misses.

    Three bounded exchanges: (1) gram occurrences → corpus counts
    (partial pre-agg inside :func:`~transmog_ray.functions.relational.
    grouped_agg` bounds the shuffle at distinct-grams × batches);
    (2) a partitioned hash join of occurrences against counts whose
    ``post_fn`` (join+aggregate fusion) reduces each join bucket to
    per-doc partials — joined gram rows never leave the task;
    (3) a tiny per-doc combine. ``dup_frac`` is an exact integer-ratio
    float64 (bit-identical in SQL). Docs with < n tokens emit no row."""
    from .relational import grouped_agg, hash_join

    if num_buckets is None:
        from ..stages.partition import default_num_buckets

        num_buckets = default_num_buckets()

    grams = ds.map_batches(
        lambda df: word_ngrams(df.dropna(subset=[text_col]), n,
                               id_col, text_col),
        batch_format="pandas",
    ).materialize()  # consumed twice: corpus counts + the join
    counts = grouped_agg(grams, ["g"], {"c": ("g", "count")},
                         num_buckets=num_buckets)
    # only duplicated grams can affect the result: in a mostly-unique
    # corpus this shrinks the join's right side from ALL distinct grams
    # to the duplicated ones; the left join leaves unmatched occurrences
    # with NaN c, which the >= 2 test already treats as unique
    dup_counts = counts.map_batches(
        lambda df: df[df["c"] >= 2], batch_format="pandas"
    )

    def per_doc_partial(df: pd.DataFrame) -> pd.DataFrame:
        ng = df.groupby(id_col, sort=False).size()
        nd = df[df["c"] >= 2].groupby(id_col, sort=False).size()
        out = pd.DataFrame({"ng_part": ng})
        out["nd_part"] = nd.reindex(ng.index, fill_value=0)
        return out.reset_index()

    joined = hash_join(grams, dup_counts, on="g", how="left",
                       num_buckets=num_buckets, post_fn=per_doc_partial)
    agg = grouped_agg(
        joined, [id_col],
        {"n_grams": ("ng_part", "sum"), "n_dup": ("nd_part", "sum")},
        num_buckets=min(num_buckets, 8),
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df["n_grams"] = df["n_grams"].astype("int64")
        df["n_dup"] = df["n_dup"].astype("int64")
        df["dup_frac"] = df["n_dup"] / df["n_grams"]
        return df

    return agg.map_batches(finish, batch_format="pandas")


def duplicate_span_stats(
    ds,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int | None = None,
):
    """Exact duplicate-SPAN coverage per document (the marking pass of
    Lee et al.-style exact substring deduplication): a word position is
    *covered* when ANY corpus-duplicated n-gram window contains it;
    output is ``(doc_id, n_words, n_covered)`` — the per-doc mass a
    span-removal pass would cut. Unlike :func:`dup_ngram_fraction`
    (which counts duplicated gram occurrences) this measures the union
    of overlapping duplicated windows, i.e. the actual text to remove.

    Three bounded exchanges, no text ever re-shuffles: (1) gram
    occurrences → corpus counts (partial pre-agg); (2) occurrences
    hash-join the (pruned) duplicated-gram counts, emitting only
    ``(doc_id, pos, dup)`` integer triples; (3) one exchange by doc
    co-locates a doc's triples and a difference-array kernel computes
    the covered-position union in O(n_words) per doc. Docs with fewer
    than *n* tokens emit no row (no gram can exist)."""
    from .relational import grouped_agg, hash_join
    from ..stages.partition import bucket_exchange

    if num_buckets is None:
        from ..stages.partition import default_num_buckets

        num_buckets = default_num_buckets()

    def grams_pos(df: pd.DataFrame) -> pd.DataFrame:
        df = df.dropna(subset=[text_col])
        toks = df[text_col].str.split(" ")
        ex = toks.explode()
        grp = ex.groupby(level=0)
        pos = grp.cumcount()
        parts = [ex]
        for i in range(1, n):
            parts.append(grp.shift(-i))
        mask = parts[-1].notna()
        g = parts[0][mask]
        for p in parts[1:]:
            g = g + " " + p[mask]
        return pd.DataFrame({
            id_col: df[id_col].loc[g.index].to_numpy(),
            "pos": pos[mask].to_numpy(np.int64),
            "g": g.to_numpy(),
        })

    grams = ds.map_batches(grams_pos, batch_format="pandas").materialize()
    counts = grouped_agg(grams, ["g"], {"c": ("g", "count")},
                         num_buckets=num_buckets)
    dup_counts = counts.map_batches(
        lambda df: df[df["c"] >= 2], batch_format="pandas"
    )

    def to_triples(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            id_col: df[id_col].to_numpy(np.int64),
            "pos": df["pos"].to_numpy(np.int64),
            "dup": (df["c"] >= 2).to_numpy(np.int64),
        })

    triples = hash_join(grams, dup_counts, on="g", how="left",
                        num_buckets=num_buckets, post_fn=to_triples)

    def coverage(df: pd.DataFrame) -> pd.DataFrame:
        ids, nw, nc = [], [], []
        for did, grp in df.groupby(id_col, sort=False):
            n_words = int(grp["pos"].max()) + n  # all starts present
            starts = grp.loc[grp["dup"] == 1, "pos"].to_numpy(np.int64)
            diff = np.zeros(n_words + 1, dtype=np.int64)
            np.add.at(diff, starts, 1)
            np.add.at(diff, starts + n, -1)
            ids.append(did)
            nw.append(n_words)
            nc.append(int((np.cumsum(diff[:-1]) > 0).sum()))
        return pd.DataFrame({id_col: ids, "n_words": nw,
                             "n_covered": nc}).astype(
            {id_col: "int64", "n_words": "int64", "n_covered": "int64"})

    return bucket_exchange(triples, [id_col], coverage,
                           min(num_buckets, 16))


def bm25_scores(
    ds,
    terms: tuple,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
):
    """Seed-query retrieval scoring for targeted corpus construction:
    BM25-shaped relevance of every document against a small query-term
    set (pick the docs "about" a topic without a model).

    ``score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·len/avglen))``
    with the RATIONAL idf ``(N − df + 0.5)/(df + 0.5)`` instead of its
    logarithm — same per-term monotonicity, but every operation is
    +,×,÷ of exactly-agreed inputs, so each TERM's contribution is
    bit-identical to the SQL (libm ``ln`` is not correctly rounded
    across engines; see CLAUDE.md pow/sqrt fact). The final ≤|terms|-
    element per-doc SUM is float-order-sensitive at the 1-ulp level —
    round scores on both sides. Documented variant, not Robertson ln.

    Two passes (the input is materialized internally — consumed
    twice): (1) one no-shuffle
    sufficient-statistics sweep — docs count, total words, per-term
    document frequencies, combined with exact Python ints on the driver;
    (2) a broadcast-idf scoring map — explode words, keep query terms,
    count tf per (doc, term), sum contributions per doc. Only docs
    matching ≥ 1 term emit a row (SQL inner GROUP BY)."""
    terms = tuple(terms)
    ds = ds.materialize()  # consumed twice: stats sweep + scoring map

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        s = df[text_col].dropna().astype(str)
        toks = s.str.split(" ")
        out = {
            "__n": [len(s)],
            "__words": [int(toks.str.len().sum()) if len(s) else 0],
        }
        padded = " " + s + " "
        for t in terms:
            out[f"__df_{t}"] = [int(
                padded.str.contains(f" {t} ", regex=False).sum()
            )]
        return pd.DataFrame(out)

    parts = ds.map_batches(stats, batch_format="pandas").take_all()
    n_docs = sum(int(p["__n"]) for p in parts)
    if n_docs == 0:
        raise ValueError("bm25_scores: no documents with text")
    avglen = sum(int(p["__words"]) for p in parts) / n_docs
    idf = {}
    for t in terms:
        df_t = sum(int(p[f"__df_{t}"]) for p in parts)
        idf[t] = (n_docs - df_t + 0.5) / (df_t + 0.5)

    def score(df: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        d = df.dropna(subset=[text_col])
        toks = d[text_col].astype(str).str.split(" ")
        ex = toks.explode()
        keep = ex.isin(terms)
        if not keep.any():
            return pd.DataFrame({
                id_col: pd.Series([], dtype=df[id_col].dtype),
                "bm25": pd.Series([], dtype="float64"),
            })
        # group by ROW position, not id: duplicate ids (re-crawls,
        # unioned shards) score per row instance instead of colliding
        pairs = pd.DataFrame({
            "_row": ex.index[keep], "t": ex[keep].to_numpy(),
        })
        tf = (
            pairs.groupby(["_row", "t"], sort=False)
            .size().reset_index(name="tf")
        )
        doclen = toks.str.len().astype(np.float64)  # unique row index
        tfv = tf["tf"].to_numpy(np.float64)
        lens = doclen.loc[tf["_row"]].to_numpy(np.float64)
        idfv = tf["t"].map(idf).to_numpy(np.float64)
        contrib = idfv * tfv * (k1 + 1.0) / (
            tfv + k1 * (1.0 - b + b * lens / avglen)
        )
        out = (
            pd.DataFrame({"_row": tf["_row"], "bm25": contrib})
            .groupby("_row", sort=False)["bm25"].sum().reset_index()
        )
        out[id_col] = d[id_col].loc[out["_row"]].to_numpy()
        return out[[id_col, "bm25"]]

    return ds.map_batches(score, batch_format="pandas")


def hashed_term_counts(
    df: pd.DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 64,
) -> pd.DataFrame:
    """Hashing-trick term counts (the HashingVectorizer shape): every
    word maps to ``md5-prefix(word) % dim`` and the output is the sparse
    ``(id, bucket, n)`` count triple per document — fixed feature width
    with NO vocabulary build, no shuffle (documents are rows, counts are
    doc-local). md5 runs once per DISTINCT word per batch (bounded by
    the batch vocabulary, not the token count); the 32-bit-prefix int is
    exactly ``CAST(CONCAT('0x', substring(md5(w),1,8)) AS BIGINT)`` in
    DuckDB, so the bucketing is oracle-reproducible."""
    import hashlib

    import numpy as np

    toks = df[text_col].dropna().astype(str).str.split(" ")
    ex = toks.explode()
    if ex.empty:
        return pd.DataFrame({
            id_col: pd.Series([], dtype=df[id_col].dtype),
            "bucket": pd.Series([], dtype="int64"),
            "n": pd.Series([], dtype="int64"),
        })
    vocab = pd.unique(ex)
    lut = {
        w: int(hashlib.md5(w.encode()).hexdigest()[:8], 16) % dim
        for w in vocab
    }
    pairs = pd.DataFrame({
        id_col: df[id_col].loc[ex.index].to_numpy(),
        "bucket": ex.map(lut).to_numpy(dtype=np.int64),
    })
    out = (
        pairs.groupby([id_col, "bucket"], sort=False)
        .size().reset_index(name="n")
    )
    out["n"] = out["n"].astype("int64")
    return out


def line_quality_filter(
    df: pd.DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    line_sep: str = "\n",
    min_words: int = 3,
    blocklist: tuple[str, ...] = ("lorem", "ipsum"),
    min_lines: int = 2,
) -> pd.DataFrame:
    """C4-style line-structured quality filter (the Raffel et al. 2020
    §2.2 line rules, with corpus-appropriate predicates): drop lines
    with fewer than *min_words* single-space-separated words or
    containing a blocklisted token; drop documents with fewer than
    *min_lines* surviving lines; reassemble survivors in original
    order with ``n_lines`` kept-count.

    Fully batch-local — a document is one row, so the explode
    (vectorized split + repeat, no row loop) and the regroup never
    leave the batch: zero shuffle at any corpus size."""
    import numpy as np

    df = df[[id_col, text_col]].dropna(subset=[text_col])
    lines = df[text_col].str.split(line_sep)
    lens = lines.str.len().to_numpy(dtype=np.int64, na_value=0)
    e = pd.DataFrame({
        id_col: np.repeat(df[id_col].to_numpy(), lens),
        "line": lines.explode().to_numpy(dtype=object)
        if lens.sum() else np.array([], dtype=object),
    })
    s = e["line"].astype(str)
    keep = (s.str.count(" ") + 1) >= min_words
    if blocklist:
        padded = " " + s + " "
        for tok in blocklist:  # token-exact, == SQL list_contains(ws, tok)
            keep &= ~padded.str.contains(f" {tok} ", regex=False)
    kept = e[keep]
    g = kept.groupby(id_col, sort=False)["line"]
    out = pd.DataFrame({
        text_col: g.agg(line_sep.join),  # exploded order == original order
        "n_lines": g.size().astype("int64"),
    }).reset_index()
    return out[out["n_lines"] >= min_lines].reset_index(drop=True)


def fingerprint(df: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """``fp`` = md5 hex of lower(trim(text)) — DuckDB ``md5(lower(trim(text)))``."""
    df["fp"] = [
        hashlib.md5(("" if t is None else str(t)).strip().lower().encode()).hexdigest()
        for t in df[text_col]
    ]
    return df


class LangId:
    """Language guesser: unicode-script detection for non-latin scripts
    (zh/ja/ko/ru/ar/el/he by dominant character range) + function-word
    profiles for 7 latin-script languages, batch-vectorized (explode +
    map, no per-row Python in the hot path). Actor-pool friendly: the
    word→languages index is compiled once in ``__init__``. Heuristic —
    no SQL oracle; rows-only check plus unit tests on known-language
    snippets."""

    def __init__(self):
        self.langs = list(_LANG_PROFILES)
        word_langs: dict[str, tuple] = {}
        for lang, prof in _LANG_PROFILES.items():
            for w in prof:
                word_langs[w] = word_langs.get(w, ()) + (lang,)
        self.word_langs = word_langs

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        s = df["text"].fillna("")
        n = len(df)
        guess = pd.Series(["und"] * n, index=df.index)

        # latin-script path: per-language function-word hit counts
        tokens = s.str.lower().str.split().explode()
        langs = tokens.map(self.word_langs).dropna().explode()
        if len(langs):
            counts = (
                pd.crosstab(langs.index, langs)
                .reindex(columns=self.langs, fill_value=0)
            )
            best = counts.idxmax(axis=1)
            hit = counts.max(axis=1) > 0
            guess.loc[best.index[hit]] = best[hit]

        # script path overrides when a non-latin script dominates
        total = s.str.len().clip(lower=1)
        for lang, pattern in _SCRIPTS:
            frac = s.str.count(pattern) / total
            guess = guess.mask(frac > 0.25, lang)

        df["lang_guess"] = guess
        return df

    def guess(self, text: str | None) -> str:
        """Single-text convenience wrapper over the batch kernel."""
        return self(pd.DataFrame({"text": [text]}))["lang_guess"].iloc[0]


def winnow_fingerprints(
    df: pd.DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    w: int = 4,
) -> pd.DataFrame:
    """MOSS-style winnowing fingerprint selection (Schleimer, Wilkerson
    & Aiken, SIGMOD 2003): hash every *k*-word shingle, slide a window
    of *w* hashes, and in each full window select the minimum hash
    (RIGHTMOST on ties — the canonical winnowing tie rule); the
    distinct selected (pos, hash) pairs are the document's
    position-robust fingerprints, guaranteed to share a selection with
    any other document containing the same ≥(w+k−1)-word run.

    Words are ``\\S+`` runs; shingle hash is the 32-bit md5 prefix of
    the space-joined shingle (``md5(w1||' '||w2||' '||w3)`` — the
    SQL-exact convention shared with the hashing trick). Window min is
    vectorized (``sliding_window_view`` + reversed argmin for the
    rightmost tie); only the md5-per-shingle loop is Python, bounded by
    words per doc. Documents with fewer than w+k−1 words emit nothing
    (no full window). Map-only: zero shuffle."""
    import re

    ids_out, pos_out, h_out = [], [], []
    for did, text in zip(df[id_col].to_numpy(), df[text_col].to_numpy()):
        words = re.findall(r"\S+", text or "")
        n = len(words) - k + 1
        if n < w:
            continue
        h = np.fromiter(
            (int(hashlib.md5(" ".join(words[i:i + k]).encode())
                 .hexdigest()[:8], 16) for i in range(n)),
            np.int64, n)
        win = np.lib.stride_tricks.sliding_window_view(h, w)
        rightmost_min = (w - 1) - np.argmin(win[:, ::-1], axis=1)
        pos = np.unique(np.arange(len(win)) + rightmost_min)
        ids_out.append(np.full(len(pos), did, dtype=np.int64))
        pos_out.append(pos.astype(np.int64))
        h_out.append(h[pos])
    if not ids_out:
        return pd.DataFrame({
            id_col: pd.Series([], dtype="int64"),
            "pos": pd.Series([], dtype="int64"),
            "h": pd.Series([], dtype="int64"),
        })
    return pd.DataFrame({
        id_col: np.concatenate(ids_out),
        "pos": np.concatenate(pos_out),
        "h": np.concatenate(h_out),
    })


def rolling_fingerprint(text: str, window: int = 16, base: int = 257,
                        mod: int = (1 << 61) - 1) -> int:
    """Deterministic rolling-hash document fingerprint (min of window
    hashes — a 1-permutation MinHash over character windows)."""
    if not text:
        return 0
    h, power = 0, pow(base, window - 1, mod)
    best = None
    data = text.encode("utf-8", "ignore")
    for i, b in enumerate(data):
        h = (h * base + b) % mod
        if i >= window:
            h = (h - data[i - window] * power * base) % mod
        if i >= window - 1:
            best = h if best is None or h < best else best
    return best if best is not None else h


def pmi_collocations(
    ds,
    text_col: str = "text",
    min_count: int = 5,
    k: int = 50,
    num_buckets: int | None = None,
):
    """Corpus collocations by pointwise-mutual-information LIFT: for
    every adjacent word pair, ``lift = (N · c_xy) / (c_x · c_y)`` —
    the RATIONAL form of PMI (its log is monotonic, so the top-k by
    lift IS the top-k by PMI) because ``log`` is libm-unreproducible
    across engines while +,×,÷ of exact integer counts is bit-exact.

    Fully distributed: per-batch vectorized bigram/unigram partial
    counts (rows never shuffle raw), grouped combines, then TWO hash
    joins attach c_x and c_y to the min_count-pruned bigram table — no
    driver-side vocabulary, no broadcast of unbounded state. N (total
    bigrams) is the one scalar pulled to the driver. Returns the
    global top-k by (lift desc, w1, w2).
    """
    from .relational import grouped_agg, hash_join, topk

    docs = ds.materialize()  # three consumers by design (uni/big/N)

    def _flat(df: pd.DataFrame):
        toks = df[text_col].fillna("").str.split(" ")
        flat = toks.explode().to_numpy(dtype=object)
        lens = toks.str.len().to_numpy(dtype=np.int64)
        return flat, lens

    def uni_partial(df: pd.DataFrame) -> pd.DataFrame:
        flat, _ = _flat(df)
        vc = pd.Series(flat).value_counts()
        return pd.DataFrame({"wd": vc.index.to_numpy(dtype=object),
                             "c": vc.to_numpy()})

    def big_partial(df: pd.DataFrame) -> pd.DataFrame:
        flat, lens = _flat(df)
        total = int(lens.sum())
        if total < 2:
            return pd.DataFrame({"w1": pd.Series([], dtype=object),
                                 "w2": pd.Series([], dtype=object),
                                 "n_xy": pd.Series([], dtype="int64")})
        # drop each doc's final token position: no bigram starts there
        not_last = np.ones(total, dtype=bool)
        not_last[np.cumsum(lens) - 1] = False
        keep = not_last[:-1]
        pairs = pd.DataFrame({"w1": flat[:-1][keep], "w2": flat[1:][keep]})
        out = pairs.groupby(["w1", "w2"], sort=False).size()
        return out.rename("n_xy").reset_index()

    def n_partial(df: pd.DataFrame) -> pd.DataFrame:
        _, lens = _flat(df)
        return pd.DataFrame({"nb": [np.int64((lens - 1).sum())]})

    n_big = int(docs.map_batches(n_partial, batch_format="pandas")
                .to_pandas()["nb"].sum())
    uni = grouped_agg(docs.map_batches(uni_partial, batch_format="pandas"),
                      ["wd"], {"c": ("c", "sum")}, num_buckets=num_buckets or 16)
    big = grouped_agg(docs.map_batches(big_partial, batch_format="pandas"),
                      ["w1", "w2"], {"n_xy": ("n_xy", "sum")},
                      num_buckets=num_buckets or 16)
    big = big.map_batches(
        lambda df: df[df["n_xy"] >= min_count].astype({"n_xy": "int64"}),
        batch_format="pandas",
    )
    c1 = uni.map_batches(
        lambda df: df.rename(columns={"wd": "w1", "c": "c1"}),
        batch_format="pandas")
    c2 = uni.map_batches(
        lambda df: df.rename(columns={"wd": "w2", "c": "c2"}),
        batch_format="pandas")
    joined = hash_join(big, c1, on="w1", num_buckets=num_buckets or 16)
    joined = hash_join(joined, c2, on="w2", num_buckets=num_buckets or 16)

    nf = float(n_big)

    def score(df: pd.DataFrame) -> pd.DataFrame:
        lift = (nf * df["n_xy"].astype(float)) / (
            df["c1"].astype(float) * df["c2"].astype(float))
        return df.assign(lift=lift)[["w1", "w2", "n_xy", "lift"]]

    scored = joined.map_batches(score, batch_format="pandas")
    return topk(scored, ["lift", "w1", "w2"], k=k,
                descending=[True, False, False])


__all__ = [
    "token_stats",
    "quality_score",
    "line_quality_filter",
    "hashed_term_counts",
    "bm25_scores",
    "BpeTokenCount",
    "BPE_PATTERN",
    "fingerprint",
    "LangId",
    "rolling_fingerprint",
    "winnow_fingerprints",
    "span_corruption_plan",
    "pmi_collocations",
    "duplicate_span_stats",
    "STOPWORDS",
]


def span_corruption_plan(
    df: pd.DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    block: int = 20,
    span: int = 3,
) -> pd.DataFrame:
    """Deterministic T5-style span-corruption PLAN: the doc's tokens
    (``\\S+`` runs) partition into fixed blocks of *block* tokens and
    every FULL block masks one *span*-token run starting at
    ``md5("{doc}_{blk}")[:8] % (block − span + 1)`` — ≈ span/block
    corruption (15% at 3/20), spans non-overlapping BY CONSTRUCTION
    (one per block, always inside it), no RNG state, the same mask on
    every re-run and any cluster size, and the md5 rule replays in SQL.
    A trailing partial block masks nothing. Output: exploded
    (id, block_no, start_tok, mask_len) rows. Map-only, zero shuffle —
    the downstream packer gathers mask positions per shard."""
    width = block - span + 1
    ids_out, blk_out, start_out = [], [], []
    ids = df[id_col].to_numpy()
    ntok = df[text_col].fillna("").str.count(r"\S+").to_numpy(dtype=np.int64)
    for did, nt in zip(ids, ntok):
        nb = int(nt) // block
        if nb <= 0:
            continue
        offs = np.fromiter(
            (int(hashlib.md5(f"{did}_{i}".encode()).hexdigest()[:8], 16)
             % width for i in range(nb)), np.int64, nb)
        ids_out.append(np.full(nb, did, dtype=np.int64))
        blk_out.append(np.arange(nb, dtype=np.int64))
        start_out.append(np.arange(nb, dtype=np.int64) * block + offs)
    if not ids_out:
        return pd.DataFrame({
            id_col: pd.Series([], dtype="int64"),
            "block_no": pd.Series([], dtype="int64"),
            "start_tok": pd.Series([], dtype="int64"),
            "mask_len": pd.Series([], dtype="int64"),
        })
    out_ids = np.concatenate(ids_out)
    return pd.DataFrame({
        id_col: out_ids,
        "block_no": np.concatenate(blk_out),
        "start_tok": np.concatenate(start_out),
        "mask_len": np.full(len(out_ids), span, dtype=np.int64),
    })


def bpe_pair_counts(docs_ds, text_col: str = "text", k: int = 20):
    """Top-*k* BPE merge candidates — corpus-wide adjacent character-pair
    counts within whitespace words, the statistic the first iteration of
    byte-pair-encoding tokenizer training maximises (Sennrich 2016).

    Two bounded exchanges, raw text never shuffles:

    1. per-batch word counts (vectorized split+explode+value_counts)
       combine into corpus word counts — one exchange of (word, count)
       partials, vocabulary-sized not token-sized;
    2. each UNIQUE word explodes into its ``len(w)-1`` adjacent pairs
       weighted by the word's corpus count (a python loop over the
       already-deduplicated vocabulary, not over tokens), pair partials
       combine in a second tiny exchange;
    3. global top-k by (count DESC, pair ASC) — the ascending pair
       tiebreak makes boundary ties deterministic cross-engine.

    SQL twin: ``substring(w, i+1, 2)`` over a correlated
    ``unnest(range(length(w)-1))``."""
    import numpy as np

    from .relational import grouped_agg, topk

    def word_counts(df: pd.DataFrame) -> pd.DataFrame:
        ex = df[text_col].fillna("").str.split(" ").explode()
        vc = ex.value_counts()
        return pd.DataFrame({"w": vc.index.to_numpy(dtype=object),
                             "c": vc.to_numpy(dtype=np.int64)})

    wc = grouped_agg(
        docs_ds.map_batches(word_counts, batch_format="pandas"),
        ["w"], {"c": ("c", "sum")},
    )

    def pair_partials(df: pd.DataFrame) -> pd.DataFrame:
        pairs: list[str] = []
        counts: list[int] = []
        for w, c in zip(df["w"], df["c"]):
            for i in range(len(w) - 1):
                pairs.append(w[i:i + 2])
                counts.append(c)
        out = pd.DataFrame({"pair": pd.Series(pairs, dtype=object),
                            "n": pd.Series(counts, dtype="int64")})
        return out.groupby("pair", as_index=False)["n"].sum()

    pc = grouped_agg(
        wc.map_batches(pair_partials, batch_format="pandas"),
        ["pair"], {"n": ("n", "sum")},
    )
    return topk(pc, ["n", "pair"], k, descending=[True, False])


def inverted_index(docs_ds, id_col: str = "doc_id", text_col: str = "text"):
    """Search-index build: token → document frequency + the sorted
    posting list (comma-joined doc ids — a STRING so the driver's
    value-hash compares it exactly; DuckDB twin is
    ``string_agg(id, ',' ORDER BY id)`` over distinct pairs).

    Per-batch distinct (doc, token) pairs explode vectorized, then ONE
    exchange partitions by token and each bucket emits (token, df,
    postings). Only id/token pairs cross the wire — never text. The
    posting list is joined INSIDE the bucket kernel after an int sort,
    so ordering is engine-independent."""
    import numpy as np

    from ..stages.partition import bucket_exchange

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        ex = df[text_col].fillna("").str.split(" ").explode()
        t = pd.DataFrame({
            id_col: df[id_col].loc[ex.index].to_numpy(),
            "tok": ex.to_numpy(dtype=object),
        })
        return t.drop_duplicates()

    pair_ds = docs_ds.select_columns([id_col, text_col]).map_batches(
        pairs, batch_format="pandas")

    def build(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates()  # same pair may arrive from many batches
        df = df.sort_values([("tok"), id_col], kind="mergesort")
        g = df.groupby("tok", sort=False)[id_col]
        out = pd.DataFrame({
            "tok": g.size().index.to_numpy(dtype=object),
            "df": g.size().to_numpy(np.int64),
            "postings": g.apply(
                lambda s: ",".join(str(int(v)) for v in s)).to_numpy(
                dtype=object),
        })
        return out

    return bucket_exchange(pair_ds, ["tok"], build)


def boolean_search(docs_ds, terms, id_col: str = "doc_id",
                   text_col: str = "text"):
    """Conjunctive (AND) token search: documents containing EVERY query
    term as a whole whitespace token. Terms broadcast in the task
    closure; the filter is a vectorized padded-substring test
    (``' '+text+' '`` contains ``' term '``) — zero shuffle, map-only,
    exactly DuckDB ``POSITION(' '||term||' ' IN ' '||text||' ') > 0``."""
    terms = list(terms)

    def hit(df: pd.DataFrame) -> pd.DataFrame:
        padded = " " + df[text_col].fillna("") + " "
        m = pd.Series(True, index=df.index)
        for t in terms:
            m &= padded.str.contains(f" {t} ", regex=False)
        return df.loc[m, [id_col]]

    return docs_ds.select_columns([id_col, text_col]).map_batches(
        hit, batch_format="pandas")


def greedy_max_coverage(docs_ds, k: int = 3, n: int = 2,
                        id_col: str = "doc_id", text_col: str = "text",
                        num_buckets: int = 8):
    """Greedy maximum-coverage document selection (the submodular
    corpus-curation primitive: pick k docs maximizing covered distinct
    word n-grams; greedy is the classic (1-1/e)-approximation).

    k distributed rounds over a materialized (doc, gram) pair table:
    each round broadcasts the covered-gram set (ray.put once per
    round, vocabulary-bounded), counts UNCOVERED grams per doc in one
    combine, takes the (gain DESC, doc_id ASC) top-1, and fetches only
    the winner's grams back to the driver. Rows never concentrate:
    the per-round shuffle is (doc, partial-gain) pairs.

    Returns a pandas frame (rank, doc_id, gain) — k rows (fewer if
    coverage saturates first), SQL-replayable by a k-step unrolled
    CTE chain."""
    import ray

    from .relational import grouped_agg, topk

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        ids, grams = [], []
        for rid, t in zip(df[id_col], df[text_col]):
            w = (t if isinstance(t, str) else "").split(" ")
            if len(w) < n:
                ids.append(rid)
                grams.append(" ".join(w))
                continue
            for i in range(len(w) - n + 1):
                ids.append(rid)
                grams.append(" ".join(w[i:i + n]))
        return pd.DataFrame({
            id_col: pd.Series(ids, dtype="int64"),
            "g": pd.Series(grams, dtype=object),
        }).drop_duplicates()

    pair_ds = docs_ds.select_columns([id_col, text_col]).map_batches(
        pairs, batch_format="pandas").materialize()

    covered: set = set()
    chosen: list[int] = []
    out_rank, out_doc, out_gain = [], [], []
    for r in range(1, k + 1):
        cov_ref = ray.put(covered)
        chosen_t = tuple(chosen)

        def gains(df: pd.DataFrame, _cov=cov_ref, _ch=chosen_t):
            cov = ray.get(_cov)
            m = ~df["g"].isin(cov)
            if _ch:
                m &= ~df[id_col].isin(_ch)
            d = df.loc[m, [id_col]].copy()
            d["gain"] = np.int64(1)
            return d

        gd = grouped_agg(
            pair_ds.map_batches(gains, batch_format="pandas"),
            [id_col], {"gain": ("gain", "sum")}, num_buckets=num_buckets,
        )
        win = topk(gd, ["gain", id_col], 1,
                   descending=[True, False]).to_pandas()
        if len(win) == 0:
            break
        doc = int(win[id_col].iloc[0])
        gain = int(win["gain"].iloc[0])
        new_grams = pair_ds.map_batches(
            lambda df, _d=doc: df.loc[df[id_col] == _d, ["g"]],
            batch_format="pandas",
        ).to_pandas()
        covered.update(new_grams["g"])
        chosen.append(doc)
        out_rank.append(r)
        out_doc.append(doc)
        out_gain.append(gain)
    return pd.DataFrame({
        "rank": pd.Series(out_rank, dtype="int64"),
        id_col: pd.Series(out_doc, dtype="int64"),
        "gain": pd.Series(out_gain, dtype="int64"),
    })
