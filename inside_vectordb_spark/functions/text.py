"""Text primitives as native Catalyst expressions.

Covers the reference's string ops (whitespace tokenize/count at
``000-get_data.py:217-228``, concat at ``001-get_embeddings.py:195-198``,
truncate at ``000-get_data.py:144``) plus the shingling/n-gram
primitives the dedup/fingerprint operators build on.

All functions return Columns built from ``pyspark.sql.functions`` —
JVM-side, codegen-friendly, no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokenize(col: Column | str) -> Column:
    """THE engine-wide whitespace tokenizer: split on the explicit
    class ``[ \\t\\n\\f\\r ]+`` and drop empty tokens.

    Two deliberate decisions (review r9-6), both for cross-engine
    determinism with the DuckDB oracles:

    - The whitespace class is spelled explicitly because Java ``\\s``
      includes vertical tab (\\x0B) while RE2's does not — the same
      divergence review r9-1 fixed in the hash encoder, which this
      function still carried: a document containing \\x0B tokenized
      differently in Spark than in every oracle. \\x0B and Unicode
      spaces are TOKEN characters on both engines now (a deviation
      from Python ``str.split()``, which treats them as separators —
      acceptable: the reference corpus is ASCII-spaced, and the rule
      is the same one the oracles can express).
    - Empty tokens are dropped HERE, not ad hoc downstream: text with
      leading/trailing tab/newline (``trim`` strips only spaces)
      split to a phantom ``''`` first element that only SOME
      consumers guarded (the n=1 shingle guard, the hash encoder,
      two oracles) — every unguarded pair silently agreed only
      because the fixtures lack such text. One clean token stream
      ends the class."""
    c = F.col(col) if isinstance(col, str) else col
    return F.array_remove(F.split(c, r"[ \t\n\f\r]+"), "")


# The oracle-side twin of ``tokenize`` — splice into DuckDB SQL with
# the text expression substituted. One definition so the two engines'
# token streams can never drift again.
def tokenize_sql(text_expr: str) -> str:
    return (
        f"list_filter(regexp_split_to_array({text_expr}, "
        "'[ \\t\\n\\f\\r]+'), t -> t <> '')"
    )


def token_count(col: Column | str) -> Column:
    """``len(text.split())`` (``000-get_data.py:217-218``); empty or
    all-whitespace text counts 0 (``tokenize`` yields an empty array
    for it — no special case needed since the phantom-''-token drop
    moved into the tokenizer, review r9-6)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(tokenize(c))


def normalize_text(col: Column | str) -> Column:
    """Canonical text normalization for dedup/fingerprint keys:
    lowercase → control/format chars (C0/C1, zero-widths) to spaces →
    whitespace runs collapsed to one space → trim. The standard
    pre-pass before exact/MinHash dedup (C4/RefinedWeb pipelines) so
    byte-level noise doesn't defeat content hashing.

    Pure Catalyst chain. Regex classes are written to mean the same
    thing in Java regex (Spark) and RE2 (DuckDB oracle): ``\\p{Cc}``/
    ``\\p{Cf}`` are Unicode categories in both; the whitespace class
    is spelled explicitly (``[ \\t\\n\\r\\f\\x0B]``) because Java's
    ``\\s`` includes vertical-tab while RE2's does not."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.lower(c)
    c = F.regexp_replace(c, r"[\p{Cc}\p{Cf}]", " ")
    c = F.regexp_replace(c, r"[ \t\n\r\f\x0B]+", " ")
    return F.trim(c)


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles as ``array<string>`` — the MinHash
    unit. Built with a ``transform`` over token positions (JVM-side),
    then ``array_distinct``. (One shingle expression exists —
    ``_shingle_expr_over`` — so the empty-token/short-doc guards can't
    drift between the column form and the hoisted stream; review r9.)"""
    return _shingle_expr_over(tokenize(col), n, distinct=True)


def _shingle_expr_over(toks: Column, n: int, distinct: bool) -> Column:
    count = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(0))
    grams = F.transform(
        F.sequence(F.lit(0), count - 1),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + F.lit(j + 1)) for j in range(n)]
        ),
    )
    body = F.array_distinct(grams) if distinct else grams
    if n == 1:
        # the phantom-''-token guard (see word_ngram_stream's
        # docstring) lives in the ONE shared expression: review r9-1
        # put it only in the hoisted stream, so the column form still
        # emitted gram='' for empty text at n=1 — the exact
        # column-vs-stream drift this helper exists to prevent
        # (caught by the word_ngram_stream hypothesis property)
        body = F.array_remove(body, "")
    return F.when(F.size(toks) < n, F.array().cast("array<string>")).otherwise(body)


def word_ngram_stream(
    docs,
    id_col: str,
    text_col: str,
    n: int,
    distinct: bool = True,
    with_count: bool = False,
    extra_ns: tuple[int, ...] = (),
):
    """Exploded word n-gram stream ``(id, [n_grams,] gram)`` with the
    tokenization HOISTED into its own projection.

    The naive ``explode(word_shingles(text, n))`` inlines the
    whitespace split into the generator, and Spark re-evaluates that
    child expression per EMITTED row (and per sibling reference like
    ``size(...)``), turning shingling O(len²) per document — measured
    9.5-28 s vs ~1 s at sf0.1 for the identical result. Projecting
    the token array first and referencing it many times blocks the
    project collapse, so the split runs once per document and the
    per-emission work is O(n) ``element_at`` + one concat.

    ``extra_ns``: additional gram widths unioned into the same stream
    (each from the SAME hoisted token array — DSIR's unigram+bigram
    bag), multiplicity following ``distinct``. ``with_count`` adds
    ``n_grams`` = size of EACH row's own width's gram array (a bigram
    row carries the bigram count — review r9 fixed the docstring,
    which claimed the primary width's count).

    No empty grams, for ANY width: ``tokenize`` keeps Python
    ``str.split()``'s no-empty-token promise only per element —
    splitting empty/all-whitespace text yields ``[""]``, one phantom
    token, which the ``size < n`` guard catches for n ≥ 2 but which
    leaked through the n = 1 path as a ``gram = ''`` row. SimHash and
    DSIR each patched it locally; the guard now lives HERE so the next
    n = 1 consumer can't silently key features off ``md5('')``
    (review r9)."""
    tk = docs.select(
        F.col(id_col).alias("__id"), tokenize(F.col(text_col)).alias("__tk")
    )
    toks = F.col("__tk")
    widths = (n, *extra_ns)
    streams = []
    for w in widths:
        # the n=1 phantom-'' guard lives inside _shingle_expr_over,
        # shared with the word_shingles column form
        sh = _shingle_expr_over(toks, w, distinct)
        cols = [F.col("__id").alias(id_col)]
        if with_count:
            cols.append(F.size(sh).alias("n_grams"))
        streams.append(tk.select(*cols, F.explode(sh).alias("gram")))
    out = streams[0]
    for s in streams[1:]:
        out = out.unionByName(s)
    return out


def char_ngrams(col: Column | str, n: int = 4) -> Column:
    """Distinct character n-grams (lowercased) as ``array<string>``."""
    c = F.lower(F.col(col) if isinstance(col, str) else col)
    count = F.greatest(F.length(c) - F.lit(n - 1), F.lit(0))
    grams = F.transform(F.sequence(F.lit(1), count), lambda i: c.substr(i, F.lit(n)))
    return F.when(F.length(c) < n, F.array().cast("array<string>")).otherwise(
        F.array_distinct(grams)
    )
