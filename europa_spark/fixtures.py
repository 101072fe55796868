"""Deterministic synthetic webtext corpus with planted ground truth.

Implements FIXTURES.md §1/§4 exactly: blocks A (unique) / B (exact dups) /
C (near dups + decoys) / D (substring dups) / E (skew boilerplate + empties)
/ F (html-only members of B/C groups), seeded (default 42), reproducible
bit-for-bit. The reference repo has no test corpus of its own
(/root/reference/README.md "To do: Add unit test"), so these fixtures ARE the
reference behavior for the recall/cluster gates.

Truth tables (§4): expected_extraction, expected_pairs, expected_clusters,
expected_quarantine. Truth is only materialized at unit scale (pairs for the
skew block are quadratic; bench-scale corpora are generated without truth).
"""

from __future__ import annotations

import hashlib
import itertools
from dataclasses import dataclass, field

import numpy as np
import pandas as pd

from .extract import extract_text_py

EPOCH = pd.Timestamp("2025-01-01T00:00:00Z")
TS_STEP_S = 137

# safe zones around the 0.8 Jaccard threshold: planted near-dups must land
# >= HI (LSH recall ~1), decoys < LO (never candidates) — no marginal pairs
_J_HI = 0.86
_J_LO = 0.72

_LANGS = ["en", "de", "fr", "ru"]
_LANG_CUM = [0.80, 0.88, 0.95, 1.00]


def _make_vocab(rng: np.random.Generator, n: int = 8000) -> np.ndarray:
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    lengths = rng.integers(3, 11, size=n)
    words = ["".join(rng.choice(letters, size=int(ln))) for ln in lengths]
    # suffix the index so words are unique (hash keys must not collide by luck)
    return np.array([f"{w}{i}" for i, w in enumerate(words)], dtype=object)


def _shingles(words: list[str], k: int = 5) -> set[tuple[str, ...]]:
    if len(words) < k:
        return {tuple(words)} if words else set()
    return {tuple(words[i : i + k]) for i in range(len(words) - k + 1)}


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)


def _lang_for(i: int) -> str:
    # deterministic by row-index hash (FIXTURES.md §1)
    h = int(hashlib.sha256(f"lang{i}".encode()).hexdigest()[:8], 16) / 0xFFFFFFFF
    for lang, cum in zip(_LANGS, _LANG_CUM):
        if h <= cum:
            return lang
    return "en"


def _wrap_html(text: str, rng: np.random.Generator) -> bytes:
    """Wrap body text in noisy html such that extraction (FIXTURES.md §2)
    returns exactly ``text``. Exercises script/style/comment/tag/entity/
    whitespace rules; vocabulary words are alphanumeric so no escaping needed.
    """
    words = text.split(" ")
    mid = len(words) // 2
    # inject a tag and an &nbsp; entity at word boundaries — both normalize
    # back to single spaces after tag->space + entity decode + collapse
    body = " ".join(words[:mid]) + " <b>&nbsp;</b> " + " ".join(words[mid:])
    if not words:
        body = ""
    tpl = (
        "<html><head><title></title>"
        "<style>p{color:red}</style>"
        '<script type="text/javascript">var a = 1 < 2;</script>'
        "</head>\n<body>\n<!-- header -->"
        f"<p>{body}</p>\n<!-- footer <x> -->"
        "</body></html>"
    )
    out = tpl.encode("utf-8")
    # truth-integrity guard: html delivery must round-trip to the exact text
    assert extract_text_py(None, out) == text, "html wrap broke the invariant"
    return out


@dataclass
class _Doc:
    key: str            # block-local sort key -> becomes url
    text: str | None
    html: bytes | None
    block: str


@dataclass
class Corpus:
    documents: pd.DataFrame
    expected_extraction: pd.DataFrame | None = None
    expected_pairs: pd.DataFrame | None = None
    expected_clusters: pd.DataFrame | None = None
    expected_quarantine: pd.DataFrame | None = None


def _adjust_mutant(
    base_words: list[str],
    target_j: float,
    rng: np.random.Generator,
    vocab: np.ndarray,
    k: int = 5,
) -> tuple[list[str], float]:
    """Token-replacement mutant of base_words whose true k-shingle Jaccard
    lands in the safe zone: >= _J_HI if target >= 0.8 else < _J_LO."""
    n = len(base_words)
    base_sh = _shingles(base_words, k)
    rho = max(1, round((1.0 - target_j) / k * n))
    positions = list(rng.permutation(n))
    mutant = list(base_words)
    replaced: list[int] = []

    def cur_j() -> float:
        return jaccard(base_sh, _shingles(mutant, k))

    # apply initial replacements
    for p in positions[:rho]:
        mutant[p] = str(vocab[int(rng.integers(0, len(vocab)))])
        replaced.append(p)
    j = cur_j()
    if target_j >= 0.8:
        # nudge up out of the marginal zone
        while j < _J_HI and replaced:
            p = replaced.pop()
            mutant[p] = base_words[p]
            j = cur_j()
    else:
        # decoy: push decisively below the candidate zone
        it = iter(positions[rho:])
        while j >= _J_LO:
            p = next(it)
            mutant[p] = str(vocab[int(rng.integers(0, len(vocab)))])
            j = cur_j()
    return mutant, j


def _make_decoy(
    base_words: list[str],
    rng: np.random.Generator,
    vocab: np.ndarray,
    max_run_chars: int = 48,
    k: int = 5,
) -> tuple[list[str], float]:
    """Below-threshold decoy that must NOT pair under ANY method: token
    replacements are spaced so no verbatim run reaches the winnowing k-gram
    size (64 chars) — with zero complete shared k-grams the substring pass
    deterministically scores 0 votes — and the resulting Jaccard (~0.1-0.2)
    sits far below the MinHash threshold."""
    mutant = list(base_words)
    run = 0
    for i, w in enumerate(base_words):
        run += len(w) + 1
        if run >= max_run_chars:
            mutant[i] = str(vocab[int(rng.integers(0, len(vocab)))])
            run = 0
    j = jaccard(_shingles(base_words, k), _shingles(mutant, k))
    assert j < _J_LO, f"decoy landed too close to threshold: {j}"
    return mutant, j


def generate(n_rows: int, seed: int = 42, truth: bool = True) -> Corpus:
    rng = np.random.default_rng(seed)
    vocab = _make_vocab(rng)

    def sample_words(lo: int, hi: int) -> list[str]:
        n = int(rng.integers(lo, hi + 1))
        return [str(w) for w in vocab[rng.integers(0, len(vocab), size=n)]]

    n_a = n_rows * 50 // 100
    n_b = n_rows * 15 // 100
    n_c = n_rows * 20 // 100
    n_d = n_rows * 5 // 100
    n_e = n_rows * 5 // 100
    n_f = n_rows - (n_a + n_b + n_c + n_d + n_e)

    docs: list[_Doc] = []
    pairs: list[tuple[str, str, str, float]] = []   # key_a, key_b, method, true_j
    edges: list[tuple[str, str]] = []               # for cluster truth
    quarantine: list[tuple[str, str]] = []          # key, reason

    # ---- block A: unique prose --------------------------------------------
    for i in range(n_a):
        docs.append(_Doc(f"a{i:07d}", " ".join(sample_words(50, 800)), None, "A"))

    # ---- block B: exact-dup groups (2-5 members) + F html members ---------
    f_budget = max(0, n_f - max(1, n_f // 3))       # most F rows join B groups
    b_group_texts: list[str] = []
    made, gi = 0, 0
    while made < n_b:
        size = 2 + gi % 4
        size = min(size, n_b - made) if n_b - made >= 2 else n_b - made
        if size < 2:
            # a lone leftover row becomes unique filler
            docs.append(_Doc(f"b{gi:05d}x", " ".join(sample_words(50, 300)), None, "B"))
            made += 1
            break
        text = " ".join(sample_words(80, 500))
        b_group_texts.append(text)
        members = [f"b{gi:05d}m{m}" for m in range(size)]
        for m in members:
            docs.append(_Doc(m, text, None, "B"))
        if f_budget > 0:
            fk = f"b{gi:05d}mf"
            docs.append(_Doc(fk, None, _wrap_html(text, rng), "F"))
            members.append(fk)
            f_budget -= 1
        for x, y in itertools.combinations(sorted(members), 2):
            pairs.append((x, y, "exact", 1.0))
            edges.append((x, y))
        made += size
        gi += 1

    # ---- block C: near-dup families (base + mutant [+ decoy]) -------------
    targets = [0.95, 0.90, 0.85]
    made, fi = 0, 0
    c_f_budget = n_f - (max(0, n_f - max(1, n_f // 3)) - f_budget)
    c_f_budget = max(0, n_f // 3)
    while made < n_c:
        remaining = n_c - made
        base_words = sample_words(200, 400)
        base_key = f"c{fi:05d}b"
        docs.append(_Doc(base_key, " ".join(base_words), None, "C"))
        made += 1
        if remaining >= 2:
            mut, j = _adjust_mutant(base_words, targets[fi % 3], rng, vocab)
            mkey = f"c{fi:05d}m"
            docs.append(_Doc(mkey, " ".join(mut), None, "C"))
            a, b = sorted([base_key, mkey])
            pairs.append((a, b, "minhash", j))
            edges.append((a, b))
            made += 1
        if remaining >= 3 and fi % 2 == 0:
            dec, j = _make_decoy(base_words, rng, vocab)
            docs.append(_Doc(f"c{fi:05d}d", " ".join(dec), None, "C"))
            made += 1
        if c_f_budget > 0 and fi % 4 == 0:
            # html-delivered exact copy of the base — joins the family via
            # content hash, proving the html and text routes converge
            fk = f"c{fi:05d}f"
            docs.append(_Doc(fk, None, _wrap_html(" ".join(base_words), rng), "F"))
            a, b = sorted([base_key, fk])
            pairs.append((a, b, "exact", 1.0))
            edges.append((a, b))
            c_f_budget -= 1
        fi += 1

    # ---- block D: substring dups ------------------------------------------
    made, di = 0, 0
    while made + 2 <= n_d:
        x_words = sample_words(400, 600)
        x_text = " ".join(x_words)
        # verbatim >= 600-char block of X at word boundaries
        start = int(rng.integers(0, max(1, len(x_words) - 200)))
        block_words, blen = [], 0
        for w in x_words[start:]:
            block_words.append(w)
            blen += len(w) + 1
            if blen >= 700:
                break
        y_text = " ".join(sample_words(250, 350)) + " " + " ".join(block_words) \
            + " " + " ".join(sample_words(250, 350))
        xk, yk = f"d{di:05d}x", f"d{di:05d}y"
        j = jaccard(_shingles(x_words), _shingles(y_text.split(" ")))
        assert j < _J_LO, f"substring pair leaked into minhash zone: {j}"
        docs.append(_Doc(xk, x_text, None, "D"))
        docs.append(_Doc(yk, y_text, None, "D"))
        pairs.append((xk, yk, "substring", j))
        edges.append((xk, yk))
        made += 2
        di += 1
    for i in range(n_d - made):  # odd leftover
        docs.append(_Doc(f"d{di:05d}z{i}", " ".join(sample_words(50, 200)), None, "D"))

    # ---- block E: skew boilerplate + empty/whitespace/no-content rows -----
    n_empty = min(max(4, n_rows // 100), max(0, n_e - 2))
    n_boiler = n_e - n_empty
    boiler_text = " ".join(sample_words(150, 250))
    boiler_keys = [f"e{i:07d}" for i in range(n_boiler)]
    for k in boiler_keys:
        docs.append(_Doc(k, boiler_text, None, "E"))
    if truth and n_boiler >= 2:
        for x, y in itertools.combinations(sorted(boiler_keys), 2):
            pairs.append((x, y, "exact", 1.0))
        # chain edges suffice for the cluster truth (same component)
        sb = sorted(boiler_keys)
        edges.extend(zip(sb, sb[1:]))
    for i in range(n_empty):
        k = f"eq{i:05d}"
        kind = i % 3
        if kind == 0:
            docs.append(_Doc(k, "", None, "E"))
            quarantine.append((k, "empty"))
        elif kind == 1:
            docs.append(_Doc(k, " \t ", None, "E"))
            quarantine.append((k, "empty"))
        else:
            docs.append(_Doc(k, None, None, "E"))
            quarantine.append((k, "no_content"))

    # ---- assemble: deterministic shuffle, urls, timestamps, langs ---------
    order = rng.permutation(len(docs))
    key_to_url: dict[str, str] = {}
    rows = []
    for i, oi in enumerate(order):
        d = docs[int(oi)]
        url = f"https://site{int(oi) % 997:04d}.example/{d.block.lower()}/{d.key}"
        key_to_url[d.key] = url
        rows.append(
            {
                "url": url,
                "warc_ts": EPOCH + pd.Timedelta(seconds=i * TS_STEP_S),
                "html": d.html,
                "text": d.text,
                "lang": _lang_for(i),
            }
        )
    documents = pd.DataFrame(rows)

    if not truth:
        return Corpus(documents=documents)

    ext_rows = []
    for r in rows:
        ext = extract_text_py(r["text"], r["html"])
        b = ext.encode("utf-8")
        ext_rows.append(
            {"url": r["url"], "text_sha256": hashlib.sha256(b).hexdigest(),
             "text_len": len(b)}
        )
    expected_extraction = pd.DataFrame(ext_rows)

    pair_rows = []
    for a, b, method, j in pairs:
        ua, ub = sorted([key_to_url[a], key_to_url[b]])
        pair_rows.append({"url_a": ua, "url_b": ub, "method": method,
                          "true_jaccard": j})
    expected_pairs = (
        pd.DataFrame(pair_rows, columns=["url_a", "url_b", "method", "true_jaccard"])
        .drop_duplicates(subset=["url_a", "url_b"])
        .sort_values(["url_a", "url_b"])
        .reset_index(drop=True)
    )

    # connected components over planted edges -> expected_clusters
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ua, ub = key_to_url[a], key_to_url[b]
        ra, rb = find(ua), find(ub)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp: dict[str, list[str]] = {}
    for u in list(parent):
        comp.setdefault(find(u), []).append(u)
    cl_rows = [
        {"url": u, "cluster_id": root}
        for root, members in comp.items()
        if len(members) >= 2
        for u in members
    ]
    expected_clusters = (
        pd.DataFrame(cl_rows, columns=["url", "cluster_id"])
        .sort_values("url").reset_index(drop=True)
    )

    expected_quarantine = pd.DataFrame(
        [{"url": key_to_url[k], "reason": r} for k, r in quarantine],
        columns=["url", "reason"],
    )

    return Corpus(
        documents=documents,
        expected_extraction=expected_extraction,
        expected_pairs=expected_pairs,
        expected_clusters=expected_clusters,
        expected_quarantine=expected_quarantine,
    )


def write_corpus(corpus: Corpus, out_dir: str) -> None:
    """Write corpus tables as parquet with explicit arrow types (html BINARY,
    warc_ts TIMESTAMP) so Spark reads the exact input_hint schema."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import os

    os.makedirs(out_dir, exist_ok=True)
    d = corpus.documents
    table = pa.Table.from_arrays(
        [
            pa.array(d["url"], type=pa.string()),
            pa.array(d["warc_ts"], type=pa.timestamp("us", tz="UTC")),
            pa.array(d["html"], type=pa.binary()),
            pa.array(d["text"], type=pa.string()),
            pa.array(d["lang"], type=pa.string()),
        ],
        names=["url", "warc_ts", "html", "text", "lang"],
    )
    # small row groups so Spark gets parallel input splits (a single row
    # group would serialize the pre-shuffle extract/signature stages)
    pq.write_table(
        table, os.path.join(out_dir, "documents.parquet"), row_group_size=4096
    )
    for name in ("expected_extraction", "expected_pairs", "expected_clusters",
                 "expected_quarantine"):
        df = getattr(corpus, name)
        if df is not None:
            pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                           os.path.join(out_dir, f"{name}.parquet"))
