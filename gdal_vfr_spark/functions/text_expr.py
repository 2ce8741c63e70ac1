"""Canonical text expressions shared by dedup/text operators and their
DuckDB oracles.

Design constraint: every function must have a DuckDB-SQL twin producing
byte-identical results, so hashing is md5-hex (both engines agree) and
"min-hash" minimizes the *hex string* lexicographically — an
order-preserving transform of any uniform hash, so LSH/Jaccard
properties are unchanged while staying engine-portable.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

TOKEN_SPLIT_RE = "[^a-z0-9]+"


def tokens_expr(text: str | Column) -> Column:
    """lower -> split on non-alphanumeric -> drop empties.
    DuckDB twin: list_filter(regexp_split_to_array(lower(t),'[^a-z0-9]+'), x -> x <> '')"""
    t = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.lower(t), TOKEN_SPLIT_RE), lambda x: x != "")


def shingles_expr(text: str | Column, n: int = 5) -> Column:
    """Distinct character n-grams of the raw text (no tokenization —
    shingling operates on the byte/char stream like MinHash literature).
    DuckDB twin: list_distinct(list_transform(range(1, greatest(len(t)-n+2,1)), i -> t[i:i+n-1]))."""
    t = F.col(text) if isinstance(text, str) else text
    idx = F.sequence(F.lit(1), F.greatest(F.length(t) - F.lit(n - 1), F.lit(1)))
    return F.array_distinct(F.transform(idx, lambda i: F.substring(t, i, n)))


def minhash_signature_expr(shingles: Column, num_hashes: int = 16) -> Column:
    """MinHash signature as an array of num_hashes md5-hex minima.

    Hash family h_i(s) = md5(i || ':' || s); signature[i] =
    lexicographic min over shingles. Hex-string min is equivalent to
    numeric min of the 128-bit value — portable across engines.
    DuckDB twin: [list_min(list_transform(sh, s -> md5(i||':'||s))) for i in range(k)].
    """
    sigs = [
        F.array_min(F.transform(shingles, lambda s: F.md5(F.concat(F.lit(f"{i}:"), s))))
        for i in range(num_hashes)
    ]
    return F.array(*sigs)


def band_keys_expr(signature: Column, bands: int, rows: int) -> Column:
    """LSH banding: split the signature into `bands` groups of `rows`
    values; band key = band index || md5(joined slice). Two docs
    sharing any band key are near-dup candidates.
    DuckDB twin: md5 over array_to_string(sig[lo:hi]).
    """
    keys = [
        F.concat(
            F.lit(f"{b}:"),
            F.md5(F.concat_ws("|", *[F.element_at(signature, b * rows + r + 1) for r in range(rows)])),
        )
        for b in range(bands)
    ]
    return F.array(*keys)
