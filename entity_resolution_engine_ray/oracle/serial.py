"""Serial single-process oracle for the pages ER pipeline.

This is the parity contract (SURVEY.md §5): a pure-Python reference
implementation of extract → block → pair → score → gate → cluster whose
decisions the distributed Ray pipeline must reproduce exactly (pairwise
F1 ≥ 0.99 ⇒ we target 1.0 on fixtures). It shares the *scalar kernels*
(similarity.py, extract.py) with the engine but none of the distributed
machinery — batching, shuffles and salting must not change any decision.

Determinism rules mirrored by the distributed stages:
- candidate pairs: within an LSH band bucket, members sorted by the SIGNED
  64-bit url hash (the engine's pair shuffle is ids-only — url strings never
  enter it — so hash order is the shared canonical order); buckets larger
  than ``max_block_size`` split into ``ceil(n/cap)`` hash sub-blocks
  (``salt_of`` = avalanche-mixed hash x block key, mod n_splits — order-free,
  so the distributed engine
  can salt the groupby key without materializing the hot bucket; dropped
  cross-sub-block pairs are counted, never silent); pairs deduped globally on
  (hash(left), hash(right)) with hash(left) < hash(right), keeping the MIN
  block key.
- gate: reject < low ≤ gray < high ≤ approve; gray resolves via fallback
  (auto_approve default — reference validation/router.py:81-94,165-170).
- clusters: union-find over approved edges; cluster_id = min member url.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import pyarrow as pa

from entity_resolution_engine_ray.config import PagesERConfig
from entity_resolution_engine_ray.functions.similarity import (
    hamming_similarity64,
    hash_tokens,
    jaccard_ids,
    jaro_winkler,
    lsh_band_keys,
    minhash_coefficients,
    minhash_signature,
    shingle_hashes,
    simhash64,
    token_jaccard,
)
from entity_resolution_engine_ray.stages.extract import (
    extract_text_column,
)

_CANON_RE = re.compile(r"[^\w\s]")


def canonical_tokens(text: str) -> list[str]:
    """Blocking/scoring token normalization, shared by engine and oracle:
    lower → punctuation→space → whitespace split."""
    if not text:
        return []
    return _CANON_RE.sub(" ", text.lower()).split()


def normalize_domain(url: str) -> str:
    """scheme/www-stripped lowercase host."""
    host = url.split("//", 1)[-1].split("/", 1)[0].lower()
    if host.startswith("www."):
        host = host[4:]
    return host


@dataclass
class PageFeatures:
    url: str
    token_set: frozenset
    simhash: int
    band_keys: list[int]
    title_norm: str


@dataclass
class OracleResult:
    features: dict[str, PageFeatures]
    candidate_pairs: list[tuple[str, str, int]]  # (left_url, right_url, block_key)
    edges: list[dict]                            # scored + gated pairs
    clusters: dict[str, str]                     # url -> cluster_id (approved graph)
    dropped_pairs: int = 0
    stats: dict = field(default_factory=dict)


def page_features(
    url: str, text: str, title: str, cfg: PagesERConfig, coeffs, cache: dict | None = None
) -> PageFeatures:
    toks = canonical_tokens(text)
    th = hash_tokens(toks, cache)
    sig = minhash_signature(shingle_hashes(th, k=cfg.shingle_k), *coeffs)
    return PageFeatures(
        url=url,
        # Jaccard is defined over the SAME 32-bit token ids in BOTH the
        # oracle and the engine (the engine ships int ids, not token strings,
        # through the pair shuffle) — identical by construction
        token_set=frozenset(int(x) for x in jaccard_ids(th)),
        simhash=simhash64(th),
        band_keys=lsh_band_keys(sig, cfg.bands),
        title_norm=" ".join(canonical_tokens(title)),
    )


def score_pair(a: PageFeatures, b: PageFeatures, cfg: PagesERConfig) -> float:
    return (
        cfg.weight_jaccard * token_jaccard(a.token_set, b.token_set)
        + cfg.weight_simhash * hamming_similarity64(a.simhash, b.simhash)
        + cfg.weight_title * jaro_winkler(a.title_norm, b.title_norm)
    )


def gate_decision(score: float, cfg: PagesERConfig) -> str:
    """Three-way gate (reference router semantics, validation/router.py:165-170)."""
    if score < cfg.gate_low:
        return "reject"
    if score >= cfg.gate_high:
        return "auto_approve"
    return "gray_approve" if cfg.fallback_mode == "auto_approve" else "review"


def n_splits_for(n_members: int, cap: int) -> int:
    """Number of hash sub-blocks for a bucket of ``n_members`` (1 = no split)."""
    return 1 if n_members <= cap else -(-n_members // cap)


def salt_of(url_hash: int, block_key: int, n_splits: int) -> int:
    """Sub-block assignment for hot-bucket splitting. The block key is mixed
    in THROUGH A FULL-AVALANCHE mix (similarity.mix64) so DIFFERENT bands of
    the same hot cluster split along genuinely different lines. A plain
    ``(hash ^ key) % n`` does NOT achieve that: XOR only relabels the
    residue classes of ``hash % n``, so every band partitioned a hot
    cluster identically and cross-sub-block members never met on any band
    (reproduced as frozen n_splits-way cluster fragmentation)."""
    from entity_resolution_engine_ray.functions.similarity import mix64

    return (mix64(url_hash ^ block_key) & 0x7FFFFFFFFFFFFFFF) % n_splits


def split_block(urls_sorted: list[str], cap: int, block_key: int = 0) -> list[list[str]]:
    """Deterministic hash-based skew capping into ``ceil(n/cap)`` sub-blocks.
    Order-free, so the engine can salt the shuffle key with the same
    assignment. Sub-blocks returned with members sorted."""
    from entity_resolution_engine_ray.functions.similarity import stable_hash64

    n_splits = n_splits_for(len(urls_sorted), cap)
    if n_splits == 1:
        return [urls_sorted]
    subs: list[list[str]] = [[] for _ in range(n_splits)]
    for u in urls_sorted:
        subs[salt_of(stable_hash64(u), block_key, n_splits)].append(u)
    return [s for s in subs if s]


class UnionFind:
    def __init__(self):
        self.parent: dict[str, str] = {}

    def find(self, x: str) -> str:
        p = self.parent.setdefault(x, x)
        while p != x:
            self.parent[x] = p = self.parent.setdefault(p, p)
            x = p
            p = self.parent[x]
        return x

    def union(self, a: str, b: str) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # min-root keeps ids deterministic
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            self.parent[hi] = lo


def run_serial_er(pages: pa.Table, cfg: PagesERConfig | None = None) -> OracleResult:
    """Full serial pipeline over a pages table (url, html[, text, title])."""
    cfg = cfg or PagesERConfig()
    coeffs = minhash_coefficients(cfg.num_perm)
    cache: dict[str, int] = {}

    urls = pages["url"].to_pylist()
    # single-column-kernel extraction — same kernel the scalar wrappers use,
    # so per-url bytes are identical to extract_text/extract_title
    text_arr, title_arr = extract_text_column(
        pages["html"].combine_chunks()
        if isinstance(pages["html"], pa.ChunkedArray)
        else pages["html"]
    )

    feats: dict[str, PageFeatures] = {}
    for url, text, title in zip(urls, text_arr.to_pylist(), title_arr.to_pylist()):
        feats[url] = page_features(url, text, title, cfg, coeffs, cache)

    # blocking: band-key buckets
    buckets: dict[int, list[str]] = {}
    for url, f in feats.items():
        for key in f.band_keys:
            buckets.setdefault(key, []).append(url)

    from entity_resolution_engine_ray.functions.similarity import stable_hash64

    pair_min_key: dict[tuple[str, str], int] = {}
    dropped = 0
    hash_of = {u: stable_hash64(u) for u in urls}
    for key, members in buckets.items():
        if len(members) < 2:
            continue
        # canonical member order = signed int64 url hash (the engine's pair
        # shuffle carries only ids, so this is the order both sides share)
        members_sorted = sorted(members, key=hash_of.__getitem__)
        runs = split_block(members_sorted, cfg.max_block_size, block_key=key)
        if len(runs) > 1:
            n = len(members_sorted)
            total = n * (n - 1) // 2
            kept = sum(len(r) * (len(r) - 1) // 2 for r in runs)
            dropped += total - kept
        for run in runs:
            emitted = 0
            for i in range(len(run)):
                for j in range(i + 1, len(run)):
                    if emitted >= cfg.pair_sample_cap:
                        dropped += 1
                        continue
                    pair = (run[i], run[j])
                    emitted += 1
                    prev = pair_min_key.get(pair)
                    if prev is None or key < prev:
                        pair_min_key[pair] = key
    candidate_pairs = [(l, r, k) for (l, r), k in pair_min_key.items()]
    candidate_pairs.sort()

    edges: list[dict] = []
    uf = UnionFind()
    approved = 0
    for left, right, key in candidate_pairs:
        if (
            cfg.simhash_prefilter is not None
            and hamming_similarity64(feats[left].simhash, feats[right].simhash)
            < cfg.simhash_prefilter
        ):
            # identical rule to the engine's vectorized prefilter
            # (stages/score._pair_score_partition) — prefiltered pairs are
            # dropped-and-counted, never scored
            dropped += 1
            continue
        s = score_pair(feats[left], feats[right], cfg)
        decision = gate_decision(s, cfg)
        edges.append(
            {"left_url": left, "right_url": right, "block_key": key, "score": s, "decision": decision}
        )
        if decision in ("auto_approve", "gray_approve"):
            uf.union(left, right)
            approved += 1

    clusters = {url: uf.find(url) for url in urls}
    return OracleResult(
        features=feats,
        candidate_pairs=candidate_pairs,
        edges=edges,
        clusters=clusters,
        dropped_pairs=dropped,
        stats={
            "n_pages": len(urls),
            "n_candidate_pairs": len(candidate_pairs),
            "n_approved": approved,
            "n_clusters": len(set(clusters.values())),
        },
    )


def labeled_pairs(pages: pa.Table, truth: pa.Table, cfg: PagesERConfig | None = None) -> pa.Table:
    """Candidate pairs at the same blocking key, labeled from cluster truth
    (FIXTURES.md §2): is_match ⇔ both urls are variants of the same doc."""
    res = run_serial_er(pages, cfg)
    doc_of = dict(zip(truth["url"].to_pylist(), truth["doc_id"].to_pylist()))
    left, right, keys, is_match = [], [], [], []
    for l, r, k in res.candidate_pairs:
        left.append(l)
        right.append(r)
        keys.append(str(k))
        is_match.append(doc_of[l] == doc_of[r])
    return pa.table(
        {
            "left_url": pa.array(left, type=pa.string()),
            "right_url": pa.array(right, type=pa.string()),
            "block_key": pa.array(keys, type=pa.string()),
            "is_match": pa.array(is_match, type=pa.bool_()),
        }
    )
