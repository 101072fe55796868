"""SimHash-64 fuzzy bit-level path — the dHash/pHash analog.

Reference semantics: 64-bit perceptual bit signatures (DifferenceHash.cs:
20-46, PerceptualHash.cs:64-120, HashSize=64), searched within a Hamming
radius (degreeOfSimilarity, SearchParametersValidator.cs:28) where the
Qdrant ±1-vector Dot score obeys dot = 64 - 2*hamming (QdrantRepository.cs:
240-247; SURVEY.md §2.9 delta 3 — we expose the Hamming threshold directly
and keep the dot-score equivalence in the tests).

Spark design: signature is ONE LongType column (cheaper than any array);
candidate generation is a pigeonhole band equi-join — split 64 bits into
``simhash_bands`` disjoint 16-bit keys; any pair within Hamming d collides
on >= 1 band when bands >= d+1 (guaranteed recall, unlike probabilistic
LSH); verification is ``bit_count(a ^ b) <= d``, whole-stage-codegen'd.

This path is NOT in the default cluster pipeline (it finds bit-level-similar
pairs the Jaccard truth tables don't plant); it is the configurable fuzzy
alternative per the north rule.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from .config import DedupConfig, CANONICAL
from .minhash import _token_hash

_U64 = np.uint64
_BIGRAM_MIX = _U64(0xC2B2AE3D27D4EB4F)

# FNV-1a-64 (public domain constants) — the SQL-expressible token hash:
# h = OFFSET; per byte: h = (h XOR b) * PRIME mod 2^64. The DuckDB twin
# replays the identical chain in HUGEINT space (__spark_entry__._simhash_ctes)
_FNV_OFFSET = 0xCBF29CE484222325
_FNV_PRIME = 0x100000001B3


def _fnv1a64(tok: str, cache: dict) -> int:
    h = cache.get(tok)
    if h is None:
        h = _FNV_OFFSET
        for b in tok.encode("utf-8"):
            h = ((h ^ b) * _FNV_PRIME) & 0xFFFFFFFFFFFFFFFF
        cache[tok] = h
    return h


_TOKEN_HASHES = {"blake2b": _token_hash, "fnv1a": _fnv1a64}


def _simhash_np(text: str, cache: dict, token_hash=_token_hash) -> int:
    """64-bit SimHash over word unigrams + bigrams (FIXTURES.md §3)."""
    toks = text.split(" ")
    th = np.fromiter(
        (token_hash(t, cache) for t in toks), dtype=_U64, count=len(toks)
    )
    if len(th) == 0:
        return 0
    feats = [th]
    if len(th) >= 2:
        feats.append(th[:-1] * _BIGRAM_MIX + th[1:])
    h = np.concatenate(feats)
    bits = (h[:, None] >> np.arange(64, dtype=_U64)[None, :]) & _U64(1)
    votes = (2 * bits.astype(np.int64) - 1).sum(axis=0)
    sig = 0
    for i in np.nonzero(votes >= 0)[0]:
        sig |= 1 << int(i)
    return sig - (1 << 64) if sig >= (1 << 63) else sig  # two's complement


_CHUNK_TOKENS = 64_000  # ~512 KB uint64 working buffers — cache-resident

# (256, 8) LUT: _BYTE_BITS[v, b] = bit b of byte value v
_BYTE_BITS = ((np.arange(256)[:, None] >> np.arange(8)[None, :]) & 1).astype(
    np.int64
)


def _segment_bit_counts(vals: np.ndarray, seg256: np.ndarray, n_rows: int) -> np.ndarray:
    """(n_rows, 64) exact per-segment set-bit counts of uint64 ``vals``;
    ``seg256`` = segment id of each value, pre-multiplied by 256."""
    lanes = vals.view(np.uint8).reshape(-1, 8)
    cnt = np.empty((n_rows, 64), dtype=np.int64)
    for bpos in range(8):
        bc = np.bincount(
            seg256 + lanes[:, bpos], minlength=n_rows * 256
        ).reshape(n_rows, 256)
        cnt[:, bpos * 8 : (bpos + 1) * 8] = bc @ _BYTE_BITS
    return cnt


def _batch_simhash(texts: list[str], token_hash=_token_hash) -> np.ndarray:
    """Chunked vectorized twin of _simhash_np (r3 VERDICT #5 — the last
    per-doc-Python-loop hot kernel): tokenize+hash all rows in one Arrow
    pass (minhash._tokenize_hashed — one hash per distinct token, gathered
    through the dictionary codes), vectorized bigram mix over the flat
    token-hash array, then per-bit set-bit counts via one cumulative sum
    per bit gathered at row boundaries (handles rows with no bigrams
    cleanly). Working set per chunk is a handful of ~512 KB buffers — the
    same cache-resident discipline as the minhash/winnow kernels.
    Bit-identical to the per-row reference kernel for both token hashes
    (hypothesis-pinned in tests/test_simhash.py)."""
    from .minhash import _tokenize_hashed

    out = np.zeros(len(texts), dtype=np.int64)
    shifts = np.arange(64, dtype=_U64)
    lens_all, T_all = _tokenize_hashed(texts, token_hash)
    starts_all = np.zeros(len(lens_all), dtype=np.int64)
    np.cumsum(lens_all[:-1], out=starts_all[1:])
    n_rows = len(lens_all)
    i = 0
    while i < n_rows:
        j, toks = i, 0
        while j < n_rows and (
            toks == 0 or toks + int(lens_all[j]) <= _CHUNK_TOKENS
        ):
            toks += int(lens_all[j])
            j += 1
        s0 = int(starts_all[i])
        lens = lens_all[i:j]
        total = toks
        T = T_all[s0 : s0 + total]
        starts = starts_all[i:j] - s0
        ends = starts + lens
        # bigram features over ALL adjacent positions, zero-padded to row
        # length: cross-row junk pairs (position ends[r]-1) and the pad are
        # ZEROED, so they add 0 to every set-bit count and are excluded from
        # n_feats — this makes the per-row B segments contiguous
        # (starts[r] .. starts[r+1]-1), which reduceat handles in one pass
        Bp = np.zeros(total, dtype=_U64)
        if total >= 2:
            np.multiply(T[:-1], _BIGRAM_MIX, out=Bp[:-1])
            Bp[:-1] += T[1:]
            Bp[ends[:-1] - 1] = 0  # cross-row pairs
            Bp[ends[-1] - 1] = 0   # last row's trailing pad slot
        # per-row per-bit set counts, exact: histogram each of the 8 byte
        # lanes into per-(row, byte-value) bins (np.bincount, one C pass per
        # lane) and expand 256 byte values -> 8 bit columns with a tiny LUT
        # matmul — ~9x less work than the r5 unpackbits/reduceat form, which
        # materialized a (total, 64) bit matrix and accumulated 64 int64
        # columns per token (measured 35.4 -> 3.8 ms per 64k-token chunk,
        # value-identical by construction: both count set bits per segment)
        seg = np.repeat(np.arange(len(lens), dtype=np.int64), lens) * 256
        ucnt = _segment_bit_counts(T, seg, len(lens))
        bcnt = _segment_bit_counts(Bp, seg, len(lens))
        # votes[r,bit] = 2*set_count - n_feats >= 0  <=>  2*set_count >= n;
        # n_feats = tokens + real bigrams = lens + max(lens-1, 0)
        n_feats = (lens + np.maximum(lens - 1, 0))[:, None]
        sig_bits = (2 * (ucnt + bcnt) >= n_feats).astype(_U64)
        out[i:j] = (sig_bits << shifts[None, :]).sum(axis=1, dtype=_U64).view(np.int64)
        i = j
    return out


def make_simhash_udf(cfg: DedupConfig = CANONICAL):
    from pyspark.sql.functions import pandas_udf

    token_hash = _TOKEN_HASHES[cfg.simhash_token_hash]

    @pandas_udf(LongType())
    def simhash64(text: pd.Series) -> pd.Series:
        return pd.Series(
            _batch_simhash(
                [t if t is not None else "" for t in text], token_hash
            )
        )

    return simhash64


def with_simhash(reps: DataFrame, cfg: DedupConfig = CANONICAL) -> DataFrame:
    udf = make_simhash_udf(cfg)
    return reps.withColumn("simhash", udf(F.col("extracted")))


def _band_cols(cfg: DedupConfig):
    nb = cfg.simhash_bands
    width = 64 // nb
    mask = (1 << width) - 1
    return F.array(
        *[
            F.shiftrightunsigned(F.col("simhash"), i * width).bitwiseAND(F.lit(mask))
            for i in range(nb)
        ]
    )


def incremental_simhash_pairs(
    existing_sigs: DataFrame,
    new_reps: DataFrame,
    cfg: DedupConfig = CANONICAL,
    existing_pairs: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Delta compute for newly-arrived documents (J4/J5 resume semantics,
    mirroring minhash/substring): cached signatures never recompute; probes
    are ONLY the new docs' pigeonhole bands, joined against the full
    accumulated band index (guaranteed recall for Hamming <= d, bands >=
    d+1); confirmed pairs anti-join away.

    Returns (new_sigs(url, simhash), new_pairs) — new_pairs touches at
    least one new doc. Skew note: the probe side is one batch (small), but
    the INDEX side grows with the whole corpus — a degenerate hot bucket
    (e.g. near-empty docs all hashing to simhash 0) would make per-batch
    join fan-out scale with total corpus size (r3 ADVICE #3). Index buckets
    above cfg.bucket_cap are therefore capped exactly like the batch path:
    a probe landing in a hot bucket pairs with the bucket's min url (the
    star anchor — whole-bucket connectivity) PLUS the members of its salted
    sub-bucket (r4 ADVICE #1: star-only routing silently lost the direct
    edge to a non-anchor near-dup; same salt formula as the batch
    hot_salt_pairs), while sub-cap buckets keep the full equi-join.
    Per-probe fan-out stays bounded at bands * (cap + salt_sub_cap + 1). n_salts derives
    from the bucket size at probe time (grows across batches), so salted
    sub-bucket membership can differ from a one-shot batch run — pinned in
    tests/test_incremental.py."""
    new_sigs = with_simhash(new_reps, cfg).select("url", "simhash").localCheckpoint()
    all_sigs = existing_sigs.select("url", "simhash").unionByName(new_sigs)
    bands = _band_cols(cfg)
    probes = new_sigs.select(
        "url", "simhash", F.posexplode(bands).alias("band_idx", "band_key")
    )
    index = all_sigs.select(
        "url", "simhash", F.posexplode(bands).alias("band_idx", "band_key")
    )
    stats = (
        index.groupBy("band_idx", "band_key")
        .agg(F.count("*").alias("bucket_n"), F.min("url").alias("bucket_min"))
        .filter(F.col("bucket_n") >= 2)
    )
    sized = index.join(stats, ["band_idx", "band_key"])
    normal_idx = sized.filter(F.col("bucket_n") <= cfg.bucket_cap).select(
        "band_idx", "band_key", "url", "simhash"
    )
    hot_min = sized.filter(
        (F.col("bucket_n") > cfg.bucket_cap) & (F.col("url") == F.col("bucket_min"))
    ).select("band_idx", "band_key", "url", "simhash")
    n_salts = F.ceil(F.col("bucket_n") / F.lit(cfg.salt_sub_cap)).cast("int")
    salt_col = F.pmod(
        F.xxhash64("url", "band_idx", "band_key"), n_salts
    ).alias("salt")
    in_salt_range = (F.col("bucket_n") > cfg.bucket_cap) & (
        F.col("bucket_n") <= cfg.star_only_cap
    )
    hot_index = sized.filter(in_salt_range).select(
        "band_idx", "band_key", "url", "simhash", salt_col
    )
    hot_probes = probes.join(
        stats.filter(in_salt_range), ["band_idx", "band_key"]
    ).select("band_idx", "band_key", "url", "simhash", salt_col)
    plain = (
        probes.alias("a")
        .join(normal_idx.unionByName(hot_min).alias("b"), ["band_idx", "band_key"])
        .filter(F.col("a.url") != F.col("b.url"))
        .select(
            F.col("a.url").alias("pa"), F.col("b.url").alias("pb"),
            F.col("a.simhash").alias("ha"), F.col("b.simhash").alias("hb"),
        )
    )
    salted = (
        hot_probes.alias("a")
        .join(hot_index.alias("b"), ["band_idx", "band_key", "salt"])
        .filter(F.col("a.url") != F.col("b.url"))
        .select(
            F.col("a.url").alias("pa"), F.col("b.url").alias("pb"),
            F.col("a.simhash").alias("ha"), F.col("b.simhash").alias("hb"),
        )
    )
    cands = (
        plain.unionByName(salted)
        .select(
            F.least("pa", "pb").alias("url_a"),
            F.greatest("pa", "pb").alias("url_b"),
            F.least("ha", "hb").alias("s1"),
            F.greatest("ha", "hb").alias("s2"),
        )
        .dropDuplicates(["url_a", "url_b"])
    )
    hamming = F.bit_count(F.expr("s1 ^ s2"))
    pairs = (
        cands.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= cfg.simhash_hamming_d)
        .select(
            "url_a", "url_b",
            F.lit("simhash").alias("method"),
            ((F.lit(64) - F.col("hamming")) / F.lit(64)).alias("score"),
        )
    )
    if existing_pairs is not None:
        pairs = pairs.join(
            existing_pairs.select("url_a", "url_b"), ["url_a", "url_b"], "left_anti"
        )
    return new_sigs, pairs


def simhash_pairs(
    reps: DataFrame | None,
    cfg: DedupConfig = CANONICAL,
    sigs: DataFrame | None = None,
    registry: list | None = None,
) -> DataFrame:
    """Confirmed pairs within Hamming distance cfg.simhash_hamming_d.

    score = (64 - hamming) / 64; the reference's dot score is recoverable as
    64 - 2*hamming (QdrantRepository.cs:240-247).

    ``registry=None``: intermediates unpersist on return (recompute per
    consumer); pass a registry to cache across consumers (see
    minhash.candidate_pairs).
    """
    own = registry is None
    if own:
        registry = []
    try:
        return _simhash_pairs(reps, cfg, sigs, registry)
    finally:
        if own:
            for f in registry:
                f.unpersist()


def _simhash_pairs(
    reps: DataFrame | None,
    cfg: DedupConfig,
    sigs: DataFrame | None,
    registry: list,
) -> DataFrame:
    if sigs is None:
        # shared by the band table and both hot/normal branches — persist so
        # the scan+UDF subtree is computed once (see minhash_pairs note)
        sigs = with_simhash(reps, cfg).select("url", "simhash").persist()
        # eager: band table + stats join + both branches reference this in
        # one job (see minhash_pairs note on racing consumers)
        sigs.count()
        if registry is not None:
            registry.append(sigs)
    else:
        sigs = sigs.select("url", "simhash")
    nb = cfg.simhash_bands
    width = 64 // nb
    mask = (1 << width) - 1
    bands = F.array(
        *[
            F.shiftrightunsigned(F.col("simhash"), i * width).bitwiseAND(F.lit(mask))
            for i in range(nb)
        ]
    )
    bt = sigs.select("url", "simhash", F.posexplode(bands).alias("band_idx", "band_key"))

    # same hot-bucket star routing as the MinHash path (degenerate signatures
    # — e.g. near-empty docs hashing to 0 — would otherwise explode).
    # Bucket stats via hash aggregation instead of a window: no full-table
    # sort, singleton buckets dropped before the join (see minhash.py).
    stats = (
        bt.groupBy("band_idx", "band_key")
        .agg(F.count("*").alias("bucket_n"), F.min("url").alias("bucket_min"))
        .filter(F.col("bucket_n") >= 2)
    )
    sized = bt.join(stats, ["band_idx", "band_key"])
    normal = sized.filter(F.col("bucket_n") <= cfg.bucket_cap).select(
        "band_idx", "band_key", "url", "simhash"
    )
    a, b = normal.alias("a"), normal.alias("b")
    cand_normal = (
        a.join(b, ["band_idx", "band_key"])
        .filter(F.col("a.url") < F.col("b.url"))
        .select(
            F.col("a.url").alias("url_a"),
            F.col("b.url").alias("url_b"),
            F.col("a.simhash").alias("sig_a"),
            F.col("b.simhash").alias("sig_b"),
        )
    )
    # hot buckets: salted sub-buckets of ~cap members (all-pairs within a
    # salt) + star edges to the bucket min — same recall/connectivity trade
    # as minhash.candidate_pairs (see that docstring). Mega buckets (above
    # cfg.star_only_cap) keep the star edges but skip the salted pairs —
    # the n*cap/2-per-band work bound (see config.star_only_cap).
    n_salts = F.ceil(F.col("bucket_n") / F.lit(cfg.salt_sub_cap)).cast("int")
    hot = sized.filter(F.col("bucket_n") > cfg.bucket_cap).select(
        "band_idx", "band_key", "url", "simhash", "bucket_min", "bucket_n",
        F.pmod(F.xxhash64("url", "band_idx", "band_key"), n_salts).alias("salt"),
    )
    hot_min = hot.select("band_idx", "band_key", "url", "simhash").alias("hm")
    cand_star = (
        hot.filter(F.col("url") != F.col("bucket_min"))
        .alias("h")
        .join(
            hot_min,
            (F.col("h.band_idx") == F.col("hm.band_idx"))
            & (F.col("h.band_key") == F.col("hm.band_key"))
            & (F.col("hm.url") == F.col("h.bucket_min")),
        )
        .select(
            F.col("h.bucket_min").alias("url_a"),
            F.col("h.url").alias("url_b"),
            F.col("hm.simhash").alias("sig_a"),
            F.col("h.simhash").alias("sig_b"),
        )
    )
    salted_side = hot.filter(F.col("bucket_n") <= cfg.star_only_cap)
    ha = salted_side.select(
        "band_idx", "band_key", "salt", "url", "simhash"
    ).alias("sa")
    hb = salted_side.select(
        "band_idx", "band_key", "salt", "url", "simhash"
    ).alias("sb")
    cand_salt = (
        ha.join(hb, ["band_idx", "band_key", "salt"])
        .filter(F.col("sa.url") < F.col("sb.url"))
        .select(
            F.col("sa.url").alias("url_a"),
            F.col("sb.url").alias("url_b"),
            F.col("sa.simhash").alias("sig_a"),
            F.col("sb.simhash").alias("sig_b"),
        )
    )
    cands = cand_normal.unionByName(cand_star).unionByName(cand_salt).dropDuplicates(
        ["url_a", "url_b"]
    )
    hamming = F.bit_count(F.expr("sig_a ^ sig_b"))
    return (
        cands.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= cfg.simhash_hamming_d)
        .select(
            "url_a",
            "url_b",
            F.lit("simhash").alias("method"),
            ((F.lit(64) - F.col("hamming")) / F.lit(64)).alias("score"),
        )
    )
