"""Pinned sequential-replay oracles for the seed-deterministic
hash/heuristic operators (MinHash-LSH pairs, SimHash pairs, HLL vocab,
SRP-LSH top-k, embedding-cosine near-dup).

These pipelines are approximate vs ground truth but BIT-DETERMINISTIC:
their output is a pure function of (input, seed) — banding keys,
signature permutations and register folds contain no partition-order
float accumulation. SQL cannot express them, but a single-process
sequential replay (plain dict buckets, no Ray, no exchange machinery,
no pair-dedup plumbing) can. This module materializes deterministic
planted corpora plus their replay outputs as parquet, so the driver
oracle becomes ``SELECT * FROM read_parquet(expected)`` with a full
rows+schema+hash comparison — the same mechanism as the warp /
percentile / JPEG pins.

What the comparison proves is exactly the property that matters at
100 TB: the distributed banded exchanges, bucketed pair dedup and
signature re-join verification reproduce the sequential semantics
bit-for-bit on every partitioning. The replays reuse only the per-item
primitives (signature/hash/register functions — reusing them is the
point: the seed and bit layout must match) and reimplement all
set/bucket/rank logic independently.

Reference behavior being covered: the reference has no dedup/ANN at
all; these operators are the LLM-data-pipeline additions required by
the brief (dedup §MinHash/SimHash, similarity search, doc analysis).
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from gridfia_ray.fixtures import FIXTURE_ROOT, GEN_VERSION

# bump when any replayed algorithm's bit behavior changes
DOCPIN_V = 2
# v5: PQ Lloyd assignment switched to the expanded-form GEMM — float
# ties can land differently than the broadcast form, so the pinned
# expected tables regenerated with the new math. v6: adds the IVF-PQ
# composition replay. v7: the IVF-PQ replay now replicates the
# pipeline's train_size Lloyd-corpus sampling (code-review finding:
# the v6 replay trained on the full corpus and matched only by luck).
ANNPIN_V = 7
AUDPIN_V = 4  # v4: + resample_expected (integer 2:1 decimation to 8 kHz)
VIDPIN_V = 1
GHLLPIN_V = 1
DDQPIN_V = 1
HSPIN_V = 1
WARPBLPIN_V = 1

ANN_PIN_QUERY_IDS = [5, 205, 1005]


# ---------------------------------------------------------------------------
# planted corpora
# ---------------------------------------------------------------------------


def _docpin_table() -> pa.Table:
    """390 deterministic docs: 300 base (40-120 tokens from a 400-word
    vocab), 30 exact dups, 60 near-dups (~6% token replacement) — so the
    minhash/simhash pair sets are non-trivially non-empty."""
    rng = np.random.RandomState(11)
    vocab = np.array([f"tok{i:03d}" for i in range(400)])
    texts: list[str] = []
    for _ in range(300):
        n_tok = int(rng.randint(40, 120))
        texts.append(" ".join(vocab[rng.randint(0, 400, n_tok)]))
    for i in range(30):
        texts.append(texts[(i * 7) % 300])
    for i in range(60):
        toks = texts[(i * 5) % 300].split()
        n_swap = max(1, len(toks) * 6 // 100)
        for p in rng.choice(len(toks), n_swap, replace=False):
            toks[p] = str(vocab[rng.randint(0, 400)])
        texts.append(" ".join(toks))
    return pa.table(
        {
            "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
            "text": pa.array(texts, pa.string()),
        }
    )


def _piipin_table() -> pa.Table:
    """The docpin texts with deterministic planted PII on every third
    document (an email, a dotted-quad IP, an international-format phone
    number) — the redaction oracle needs real matches, and the driver's
    random sf tables contain none."""
    docs = _docpin_table()
    texts = docs["text"].to_pylist()
    out = []
    for i, t in enumerate(texts):
        if i % 3 == 0:
            t = (
                f"{t} contact user{i}@example.com or admin.{i}@mail-sub.example.org "
                f"from 10.{i % 256}.{(i * 7) % 256}.{(i * 13) % 256} "
                f"call +14155550{i:03d}"
            )
        out.append(t)
    return pa.table(
        {"doc_id": docs["doc_id"], "text": pa.array(out, pa.string())}
    )


def _annpin_arrays() -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(vecs f32 (n,32), vec_id int64, label int32): 4000 clustered
    vectors + 120 planted near-dups (tiny noise on the first 120, new
    ids) so the near-dup pair set is non-empty and LSH recall is
    exercised on real cluster structure."""
    n, dim, n_clusters, n_dup = 4000, 32, 24, 120
    rng = np.random.RandomState(77)
    centers = rng.normal(size=(n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.randint(0, n_clusters, n)
    vecs = (centers[labels] + 0.25 * rng.normal(size=(n, dim))).astype(np.float32)
    dups = (vecs[:n_dup] + 0.01 * rng.normal(size=(n_dup, dim))).astype(np.float32)
    all_vecs = np.vstack([vecs, dups])
    ids = np.arange(n + n_dup, dtype=np.int64)
    all_labels = np.concatenate([labels, labels[:n_dup]]).astype(np.int32)
    return all_vecs, ids, all_labels


# ---------------------------------------------------------------------------
# sequential replays (no Ray, dict buckets, independent pair logic)
# ---------------------------------------------------------------------------


def _replay_minhash_pairs(
    ids: np.ndarray,
    texts: list[str],
    n_perm: int = 128,
    n_bands: int = 32,
    k_shingle: int = 3,
    threshold: float = 0.5,
    seed: int = 42,
) -> pa.Table:
    from gridfia_ray.dedup.docs import MinHasher
    from gridfia_ray.text.hashing import _P1, avalanche64

    mat = MinHasher(n_perm=n_perm, k_shingle=k_shingle, seed=seed).signatures(texts)
    n, rows = len(ids), n_perm // n_bands
    bands3 = np.ascontiguousarray(mat).view(np.uint64).reshape(n, n_bands, rows)
    with np.errstate(over="ignore"):
        acc = np.zeros((n, n_bands), np.uint64)
        for j in range(rows):
            acc = acc * _P1 ^ bands3[:, :, j]
    band_hash = (avalanche64(acc) >> np.uint64(1)).astype(np.int64)
    cand: set[tuple[int, int]] = set()
    for b in range(n_bands):
        buckets: dict[int, list[int]] = {}
        for i in range(n):
            buckets.setdefault(int(band_hash[i, b]), []).append(i)
        for idxs in buckets.values():
            for x in range(len(idxs)):
                for y in range(x + 1, len(idxs)):
                    a_id, b_id = int(ids[idxs[x]]), int(ids[idxs[y]])
                    cand.add((min(a_id, b_id), max(a_id, b_id)))
    pos = {int(d): i for i, d in enumerate(ids)}
    keep = sorted(
        (a, b) for a, b in cand if (mat[pos[a]] == mat[pos[b]]).mean() >= threshold
    )
    return pa.table(
        {
            "a": pa.array([p[0] for p in keep], pa.int64()),
            "b": pa.array([p[1] for p in keep], pa.int64()),
        }
    )


def _replay_simhash_pairs(
    ids: np.ndarray, texts: list[str], max_hamming: int = 3, n_bands: int = 8
) -> pa.Table:
    from gridfia_ray.codecs.phash import hamming64
    from gridfia_ray.dedup.docs import SimHasher
    from gridfia_ray.text.hashing import simhash_band_decompose

    sh = SimHasher().sim64_batch(texts)
    n = len(ids)
    _, vals = simhash_band_decompose(sh, n_bands)  # band-major, length n*n_bands
    cand: set[tuple[int, int]] = set()
    for b in range(n_bands):
        buckets: dict[int, list[int]] = {}
        v = vals[b * n : (b + 1) * n]
        for i in range(n):
            buckets.setdefault(int(v[i]), []).append(i)
        for idxs in buckets.values():
            for x in range(len(idxs)):
                for y in range(x + 1, len(idxs)):
                    ia, ib = idxs[x], idxs[y]
                    if int(hamming64(sh[ia : ia + 1], sh[ib : ib + 1])[0]) <= max_hamming:
                        a_id, b_id = int(ids[ia]), int(ids[ib])
                        cand.add((min(a_id, b_id), max(a_id, b_id)))
    keep = sorted(cand)
    return pa.table(
        {
            "a": pa.array([p[0] for p in keep], pa.int64()),
            "b": pa.array([p[1] for p in keep], pa.int64()),
        }
    )


def _replay_hll_vocab(texts: list[str], p: int = 14) -> pa.Table:
    from gridfia_ray.analysis.sketches import hll_estimate, hll_registers
    from gridfia_ray.text.hashing import token_hashes64

    th, _ = token_hashes64(texts, lower=True)
    est = hll_estimate(hll_registers(np.asarray(th, dtype=np.uint64), p))
    return pa.table({"vocab_est": pa.array([int(round(est))], pa.int64())})


def _replay_lsh_topk(
    vecs: np.ndarray,
    ids: np.ndarray,
    query_ids: list[int],
    k: int = 10,
    n_planes: int = 64,
    hamming_radius: int = 24,
    seed: int = 42,
) -> pa.Table:
    from gridfia_ray.ann.search import _normalize, make_planes, srp_signature
    from gridfia_ray.codecs.phash import hamming64

    dim = vecs.shape[1]
    planes = make_planes(dim, n_planes, seed)
    vn = _normalize(np.asarray(vecs, dtype=np.float64))
    pos = {int(d): i for i, d in enumerate(ids)}
    qn = _normalize(np.asarray(vecs[[pos[q] for q in query_ids]], dtype=np.float64))
    sig = srp_signature(vn, planes)
    qsig = srp_signature(qn, planes)
    out_q, out_v, out_r = [], [], []
    for qi, qid in enumerate(query_ids):
        ham = hamming64(sig, np.full(len(sig), qsig[qi]))
        cand = np.nonzero(ham <= hamming_radius)[0]
        s = vn[cand] @ qn[qi]
        order = np.lexsort((ids[cand], -s))[:k]  # cosine desc, vec_id asc
        out_q.extend([qid] * len(order))
        out_v.extend(ids[cand[order]].tolist())
        out_r.extend(range(1, len(order) + 1))
    return pa.table(
        {
            "query_id": pa.array(out_q, pa.int64()),
            "vec_id": pa.array(out_v, pa.int64()),
            "rank": pa.array(out_r, pa.int64()),
        }
    )


def _replay_near_dup(
    vecs: np.ndarray,
    ids: np.ndarray,
    threshold: float = 0.95,
    band_bits: int = 8,
    seed: int = 42,
) -> pa.Table:
    from gridfia_ray.ann.search import _normalize, make_planes, srp_signature
    from gridfia_ray.codecs.phash import hamming64

    n_bands = 64 // band_bits
    mask = np.uint64((1 << band_bits) - 1)
    # same μ+5σ prefilter radius formula as embedding_near_dup_pairs
    p = float(np.arccos(np.clip(threshold, -1.0, 1.0)) / np.pi)
    prefilter = min(63, int(np.ceil(64 * p + 5 * np.sqrt(64 * p * (1 - p)))))
    vn = _normalize(np.asarray(vecs, dtype=np.float64))
    sig = srp_signature(vn, make_planes(vecs.shape[1], 64, seed))
    usig = sig.view(np.uint64)
    cand: set[tuple[int, int]] = set()
    n = len(ids)
    for b in range(n_bands):
        buckets: dict[int, list[int]] = {}
        v = ((usig >> np.uint64(b * band_bits)) & mask).astype(np.int64)
        for i in range(n):
            buckets.setdefault(int(v[i]), []).append(i)
        for idxs in buckets.values():
            for x in range(len(idxs)):
                for y in range(x + 1, len(idxs)):
                    ia, ib = idxs[x], idxs[y]
                    if int(hamming64(sig[ia : ia + 1], sig[ib : ib + 1])[0]) <= prefilter:
                        cand.add((min(int(ids[ia]), int(ids[ib])),
                                  max(int(ids[ia]), int(ids[ib]))))
    pos = {int(d): i for i, d in enumerate(ids)}
    keep = sorted(
        (a, b)
        for a, b in cand
        if float((vn[pos[a]] * vn[pos[b]]).sum()) >= threshold
    )
    return pa.table(
        {
            "a": pa.array([p_[0] for p_ in keep], pa.int64()),
            "b": pa.array([p_[1] for p_ in keep], pa.int64()),
        }
    )


def _replay_kmeans(
    vecs64: np.ndarray,
    ids: np.ndarray,
    k: int,
    n_iters: int,
    seed: int,
    sample_size: int = 4096,
    round_decimals: int = 9,
    tol: float = 1e-6,
    train_size: int | None = None,
) -> np.ndarray:
    """Sequential twin of ann/ivf.kmeans_fit. The distributed fold
    accumulates per-block float partials in a different order than this
    single pass, but both round centroids to ``round_decimals`` after
    every update — the ~1e-16 accumulation jitter is absorbed by the
    1e-9 grid, so the centroid SEQUENCE is bit-identical across
    partitionings and against this replay. ``train_size`` replicates
    kmeans_fit's hash-threshold Lloyd-corpus sampling EXACTLY (E[kept]
    = train_size; the pool is drawn from the filtered set, as in the
    pipeline) — omitting it against a train_size build trains on a
    different corpus and diverges."""
    from gridfia_ray.ann.ivf import _best_init, _splitmix64
    from gridfia_ray.ann.search import _normalize

    if train_size is not None and train_size < len(ids):
        thresh = np.uint64(int(train_size / len(ids) * 2.0**64))
        keep = _splitmix64(ids.view(np.uint64)) < thresh
        vecs64 = vecs64[keep]
        ids = ids[keep]
    vn = _normalize(vecs64)
    h = _splitmix64(ids.view(np.uint64))
    pool = vecs64[np.argsort(h, kind="stable")[:sample_size]]
    kk = min(k, len(pool))
    c = np.round(_best_init(pool, kk, seed), round_decimals)
    pool_n = _normalize(pool)
    for _ in range(n_iters):
        assign = np.argmax(vn @ c.T, axis=1)
        counts = np.bincount(assign, minlength=kk).astype(np.int64)
        sums = np.zeros_like(c)
        np.add.at(sums, assign, vecs64)
        new = c.copy()
        nz = counts > 0
        new[nz] = sums[nz] / counts[nz, None]
        new = _normalize(new)
        if (~nz).any():
            far = np.argsort(np.max(pool_n @ new.T, axis=1), kind="stable")
            for j, cell in enumerate(np.nonzero(~nz)[0]):
                new[cell] = pool_n[far[j % len(far)]]
        new = np.round(new, round_decimals)
        shift = float(np.max(np.linalg.norm(new - c, axis=1)))
        c = new
        if shift < tol:
            break
    return c


def _replay_semantic_dedup(
    vecs: np.ndarray,
    ids: np.ndarray,
    k: int = 16,
    eps: float = 0.95,
    n_iters: int = 10,
    seed: int = 42,
) -> pa.Table:
    """Sequential twin of dedup/semantic.semantic_dedup: replayed
    kmeans (see _replay_kmeans), argmax assignment, then the library's
    per-cluster prune rule applied cluster by cluster (reusing
    _prune_cluster is the point — the rule's bit behavior must match;
    the clustering, exchange and grouping machinery is what this
    verifies)."""
    from gridfia_ray.ann.search import _normalize
    from gridfia_ray.dedup.semantic import _prune_cluster

    vecs64 = np.asarray(vecs, np.float64)
    vn = _normalize(vecs64)
    c = _replay_kmeans(vecs64, ids, k, n_iters, seed)
    assign = np.argmax(vn @ c.T, axis=1)
    out_id, out_cl, out_keep = [], [], []
    for cell in np.unique(assign):
        m = assign == cell
        g_ids, g_vn = ids[m], vn[m]
        cen = _normalize(c[cell][None, :])[0]
        sim_c = g_vn @ cen
        order = np.lexsort((g_ids, sim_c))
        keep = _prune_cluster(g_vn, order, eps)
        out_id.extend(g_ids.tolist())
        out_cl.extend([int(cell)] * len(g_ids))
        out_keep.extend(bool(x) for x in keep)
    df = pa.table(
        {
            "vec_id": pa.array(out_id, pa.int64()),
            "cluster": pa.array(out_cl, pa.int32()),
            "keep": pa.array(out_keep, pa.bool_()),
        }
    )
    return df.sort_by("vec_id")


def _replay_ivf_topk(
    vecs: np.ndarray,
    ids: np.ndarray,
    query_ids: list[int],
    k: int = 10,
    k_cells: int = 8,
    nprobe: int = 4,
    n_iters: int = 20,
    seed: int = 42,
    sample_size: int = 4096,
    round_decimals: int = 9,
    tol: float = 1e-6,
) -> pa.Table:
    """Sequential spherical k-means + probed search. The distributed
    Lloyd fold accumulates per-block float partials in a different
    order than this single pass, but both round centroids to 9 decimals
    after every update (ann/ivf.kmeans_fit round_decimals) — the ~1e-16
    accumulation jitter is absorbed by the 1e-9 grid, so the centroid
    SEQUENCE (and hence cell assignment, probing and top-k) is
    bit-identical across partitionings and against this replay."""
    from gridfia_ray.ann.search import _normalize

    vecs64 = np.asarray(vecs, np.float64)
    vn = _normalize(vecs64)
    c = _replay_kmeans(vecs64, ids, k_cells, n_iters, seed, sample_size,
                       round_decimals, tol)
    kk = len(c)
    pos = {int(d): i for i, d in enumerate(ids)}
    qn = _normalize(vecs64[[pos[q] for q in query_ids]])
    probes = np.argsort(-(qn @ c.T), axis=1, kind="stable")[:, : min(nprobe, kk)]
    cells = np.argmax(vn @ c.T, axis=1)
    out_q, out_v, out_r = [], [], []
    for qi, qid in enumerate(query_ids):
        mask = np.isin(cells, probes[qi])
        sel_ids = ids[mask]
        s = vn[mask] @ qn[qi]
        order = np.lexsort((sel_ids, -s))[:k]  # cosine desc, vec_id asc
        out_q.extend([qid] * len(order))
        out_v.extend(sel_ids[order].tolist())
        out_r.extend(range(1, len(order) + 1))
    return pa.table(
        {
            "query_id": pa.array(out_q, pa.int64()),
            "vec_id": pa.array(out_v, pa.int64()),
            "rank": pa.array(out_r, pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# cached fixture dirs
# ---------------------------------------------------------------------------


def _ensure_dir(name: str, builder) -> dict:
    out = os.path.join(FIXTURE_ROOT, name)
    marker = os.path.join(out, "_COMPLETE")
    if os.path.exists(marker):
        with open(os.path.join(out, "paths.json")) as f:
            return json.load(f)
    os.makedirs(FIXTURE_ROOT, exist_ok=True)
    tmp = tempfile.mkdtemp(prefix=f".{name}-", dir=FIXTURE_ROOT)
    try:
        rel = builder(tmp)
        with open(os.path.join(tmp, "paths.json"), "w") as f:
            json.dump({k: os.path.join(out, v) for k, v in rel.items()}, f)
        with open(os.path.join(tmp, "_COMPLETE"), "w") as f:
            f.write("ok\n")
        if os.path.exists(out):
            shutil.rmtree(tmp, ignore_errors=True)
        else:
            os.rename(tmp, out)
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    with open(os.path.join(out, "paths.json")) as f:
        return json.load(f)


def ensure_docpin() -> dict:
    """{'documents', 'minhash_expected', 'simhash_expected',
    'hll_expected'} parquet paths (cached, atomic)."""

    def build(tmp: str) -> dict:
        docs = _docpin_table()
        ids = docs["doc_id"].to_numpy()
        texts = docs["text"].to_pylist()
        pq.write_table(docs, os.path.join(tmp, "documents.parquet"))
        pq.write_table(
            _replay_minhash_pairs(ids, texts), os.path.join(tmp, "minhash_expected.parquet")
        )
        pq.write_table(
            _replay_simhash_pairs(ids, texts), os.path.join(tmp, "simhash_expected.parquet")
        )
        pq.write_table(_replay_hll_vocab(texts), os.path.join(tmp, "hll_expected.parquet"))
        pq.write_table(_piipin_table(), os.path.join(tmp, "pii_documents.parquet"))
        return {
            "documents": "documents.parquet",
            "minhash_expected": "minhash_expected.parquet",
            "simhash_expected": "simhash_expected.parquet",
            "hll_expected": "hll_expected.parquet",
            "pii_documents": "pii_documents.parquet",
        }

    return _ensure_dir(f"docpin-v{GEN_VERSION}.{DOCPIN_V}", build)


def load_annpin_matrix() -> tuple[np.ndarray, np.ndarray]:
    """(vecs f32 (n, dim), vec_id int64) from the cached annpin
    embeddings parquet — the shared loader for the pinned ANN queries
    and tests."""
    emb = pq.read_table(ensure_annpin()["embeddings"])
    ids = emb["vec_id"].to_numpy()
    mat = np.asarray(
        emb["embedding"].combine_chunks().values.to_numpy(zero_copy_only=False),
        np.float32,
    ).reshape(len(ids), -1)
    return mat, ids


S2PIN_V = 1
S2_PIN_LEVEL = 14
STATPIN_V = 1
STAT_PIN_ITERS = 500


def statpin_xy() -> tuple[np.ndarray, np.ndarray]:
    """Deterministic two-group sample for the resampling pins — shared
    verbatim by the distributed query and the sequential replay (the
    algorithms differ; the input must not)."""
    rng = np.random.RandomState(101)
    x = rng.gamma(2.0, 10.0, 400)
    y = rng.gamma(2.2, 10.0, 300)
    return x, y


def ensure_statpin() -> dict:
    """{'expected'} parquet path for the seeded bootstrap CI +
    permutation test (analysis/stats O4/O5): each iteration i draws
    from ``RandomState(seed + i)`` — a pure function of the iteration
    index, independent of which worker runs it — so a sequential loop
    over the same iteration indices reproduces the distributed result
    bit-for-bit (np.percentile sorts, the p-value counts; both are
    order-free over the identical stat multiset)."""

    def build(tmp: str) -> dict:
        x, y = statpin_xy()
        seed, n_iter = 42, STAT_PIN_ITERS
        boot = np.empty(n_iter)
        for i in range(n_iter):
            rng = np.random.RandomState(seed + i)
            boot[i] = (
                rng.choice(x, x.size, replace=True).mean()
                - rng.choice(y, y.size, replace=True).mean()
            )
        lo, hi = np.percentile(boot, [2.5, 97.5])
        combined = np.concatenate([x, y])
        perm = np.empty(n_iter)
        for i in range(n_iter):
            rng = np.random.RandomState(seed + i)
            sh = rng.permutation(combined)
            perm[i] = sh[: x.size].mean() - sh[x.size :].mean()
        observed = float(np.mean(x) - np.mean(y))
        p_num = int(np.sum(np.abs(perm) >= abs(observed)) + 1)

        def u(v: float) -> int:
            return int(np.floor(v * 1_000_000 + 0.5))

        pq.write_table(
            pa.table(
                {
                    "observed_u": pa.array([u(observed)], pa.int64()),
                    "ci_low_u": pa.array([u(float(lo))], pa.int64()),
                    "ci_high_u": pa.array([u(float(hi))], pa.int64()),
                    "p_num": pa.array([p_num], pa.int64()),
                    "n_iterations": pa.array([n_iter], pa.int64()),
                }
            ),
            os.path.join(tmp, "expected.parquet"),
        )
        return {"expected": "expected.parquet"}

    return _ensure_dir(f"statpin-v{GEN_VERSION}.{STATPIN_V}", build)


def ensure_s2pin() -> dict:
    """{'expected'} parquet path: per-S2-cell (level 14) pixel counts
    and micro-scaled total-biomass sums over the t2 fixture — a
    sequential replay over the fixture generator's independent pixel
    table (stored-total rows → affine pixel centers → Albers→WGS84 →
    s2_cell_id → int sums). The distributed query decodes the TILE
    STORE instead; the hash compare pins that decode + per-tile affine
    + projection + spherical keying + groupby reproduce it exactly."""

    def build(tmp: str) -> dict:
        import pyarrow.compute as pc
        import pyarrow.parquet as pqq

        from gridfia_ray import fixtures
        from gridfia_ray.geo.crs import transform_points
        from gridfia_ray.geo.s2cells import s2_cell_id

        d = fixtures.ensure_fixture("t2")
        t = pqq.read_table(
            os.path.join(d, "pixels.parquet"),
            columns=["species_code", "y", "x", "biomass"],
        )
        t = t.filter(pc.equal(t["species_code"], "0000"))
        y = t["y"].to_numpy().astype(np.float64)
        x = t["x"].to_numpy().astype(np.float64)
        wx = fixtures.ORIGIN_X + (x + 0.5) * fixtures.PX
        wy = fixtures.ORIGIN_Y - (y + 0.5) * fixtures.PX
        lng, lat = transform_points(wx, wy, fixtures.CRS, "EPSG:4326")
        cells = s2_cell_id(lat, lng, S2_PIN_LEVEL)
        su = np.floor(t["biomass"].to_numpy() * 1_000_000 + 0.5).astype(np.int64)
        uniq, inv = np.unique(cells, return_inverse=True)
        sums = np.zeros(len(uniq), np.int64)
        counts = np.zeros(len(uniq), np.int64)
        np.add.at(sums, inv, su)
        np.add.at(counts, inv, 1)
        pq.write_table(
            pa.table(
                {
                    "s2_cell": pa.array(uniq, pa.int64()),
                    "n_px": pa.array(counts, pa.int64()),
                    "sum_u": pa.array(sums, pa.int64()),
                }
            ),
            os.path.join(tmp, "expected.parquet"),
        )
        return {"expected": "expected.parquet"}

    return _ensure_dir(f"s2pin-v{GEN_VERSION}.{S2PIN_V}", build)


def _audpin_clips() -> list[tuple[int, np.ndarray, int]]:
    """60 deterministic mono clips: sine sweeps, white noise, silence,
    and clipped square waves at 8/16 kHz, 800-4000 samples."""
    rng = np.random.RandomState(23)
    clips = []
    for i in range(60):
        rate = 8000 if i % 2 == 0 else 16000
        n = int(rng.randint(800, 4000))
        t = np.arange(n) / rate
        kind = i % 4
        if kind == 0:
            x = 0.8 * np.sin(2 * np.pi * (100 + 37 * i) * t)
        elif kind == 1:
            x = 0.3 * rng.standard_normal(n)
        elif kind == 2:
            x = np.zeros(n)
        else:
            x = np.sign(np.sin(2 * np.pi * (50 + 11 * i) * t)) * 0.99
        clips.append((i, x.astype(np.float64), rate))
    return clips


def ensure_audpin() -> dict:
    """{'clips', 'features_expected'} parquet paths: WAV/PCM payload
    rows plus the pinned per-clip features — a sequential replay of
    exactly the decode + feature math the distributed
    ``AudioFeatureActor`` pool runs (same standard as the JPEG pin:
    encode once at fixture gen, the distributed path must reproduce the
    sequential decode bit-for-bit)."""

    def build(tmp: str) -> dict:
        from gridfia_ray.codecs.wav import decode_wav_pcm16, encode_wav_pcm16
        from gridfia_ray.stages.multimodal import (
            audio_features,
            spectrogram_features,
            spectrogram_tables,
        )

        from gridfia_ray.stages.multimodal import decimate2_int16

        tables = spectrogram_tables()
        ids, bufs, rows, specs, rsrows = [], [], [], [], []
        for cid, x, rate in _audpin_clips():
            buf = encode_wav_pcm16(x, rate)
            ids.append(cid)
            bufs.append(buf)
            samples, r = decode_wav_pcm16(buf)
            rows.append({"clip_id": cid, **audio_features(samples, r)})
            specs.append({"clip_id": cid, **spectrogram_features(samples, tables)})
            # sequential twin of the AudioResampleActor normalization:
            # 8 kHz passthrough, 16 kHz → integer 2:1 decimation (the
            # FIR kernel is the shared primitive)
            i16 = np.rint(np.asarray(samples, np.float64) * 32768.0).astype(
                np.int64
            )
            out = i16.astype(np.int16) if r == 8000 else decimate2_int16(i16)
            rsrows.append(
                {
                    "clip_id": cid,
                    **audio_features(out.astype(np.float64) / 32768.0, 8000),
                }
            )
        pq.write_table(
            pa.table(
                {
                    "clip_id": pa.array(ids, pa.int64()),
                    "bytes": pa.array(bufs, pa.binary()),
                    "fmt": pa.array(["wav"] * len(ids), pa.string()),
                }
            ),
            os.path.join(tmp, "clips.parquet"),
        )
        exp = pa.Table.from_pylist(rows)
        exp = exp.select(
            ["clip_id", "n_samples", "rate", "duration_ms", "rms_u", "peak_u",
             "zero_crossings"]
        )
        pq.write_table(exp.sort_by("clip_id"), os.path.join(tmp, "features_expected.parquet"))
        spec = pa.Table.from_pylist(specs)
        spec = spec.select(["clip_id", "n_frames", *[f"e{b}" for b in range(8)]])
        pq.write_table(
            spec.sort_by("clip_id"), os.path.join(tmp, "spectrogram_expected.parquet")
        )
        rs = pa.Table.from_pylist(rsrows).select(
            ["clip_id", "n_samples", "rate", "duration_ms", "rms_u",
             "peak_u", "zero_crossings"]
        )
        pq.write_table(
            rs.sort_by("clip_id"), os.path.join(tmp, "resample_expected.parquet")
        )
        return {
            "clips": "clips.parquet",
            "features_expected": "features_expected.parquet",
            "spectrogram_expected": "spectrogram_expected.parquet",
            "resample_expected": "resample_expected.parquet",
        }

    return _ensure_dir(f"audpin-v{GEN_VERSION}.{AUDPIN_V}", build)


def ensure_ghllpin() -> dict:
    """{'rows', 'expected'} parquet paths for the grouped-HLL sketch:
    skewed (day, user_id) rows plus the pinned per-group estimates — a
    sequential register replay (hll_registers + hll_estimate per group,
    no Ray). Register max-merge is order-free and the row hash is
    deterministic, so the distributed bucketed merge must reproduce the
    replay bit-for-bit at any partitioning."""

    def build(tmp: str) -> dict:
        from gridfia_ray.analysis.sketches import (
            _hash_columns,
            hll_estimate,
            hll_registers,
        )

        rng = np.random.RandomState(29)
        days, users = [], []
        sizes = {"2024-01-01": (20_000, 6_000), "2024-01-02": (3_000, 700),
                 "2024-01-03": (250, 90), "2024-01-04": (12, 12),
                 "2024-01-05": (1, 1)}
        for day, (n_rows, card) in sizes.items():
            days.append(np.repeat(day, n_rows))
            users.append(rng.randint(0, card, n_rows).astype(np.int64))
        df = pa.table(
            {
                "day": pa.array(np.concatenate(days), pa.string()),
                "user_id": pa.array(np.concatenate(users), pa.int64()),
            }
        )
        pq.write_table(df, os.path.join(tmp, "rows.parquet"))
        import pandas as pd

        pdf = df.to_pandas()
        rows = []
        for day, sub in pdf.groupby("day"):
            est = hll_estimate(hll_registers(_hash_columns(sub, ["user_id"]), 12))
            rows.append({"day": day, "est_u": int(np.floor(est * 1_000_000 + 0.5))})
        exp = pa.Table.from_pylist(rows).cast(
            pa.schema([("day", pa.string()), ("est_u", pa.int64())])
        )
        pq.write_table(exp.sort_by("day"), os.path.join(tmp, "expected.parquet"))
        return {"rows": "rows.parquet", "expected": "expected.parquet"}

    return _ensure_dir(f"ghllpin-v{GEN_VERSION}.{GHLLPIN_V}", build)


def ensure_warpblpin() -> dict:
    """{'expected'} parquet path for the BILINEAR Web-Mercator warp:
    single-process brute-force reprojection over the stitched seeded
    cube (rebuilt via fixtures.build_cube — deterministic), 4-corner
    blend through the SAME ``bilinear_blend`` leaf the pipeline runs,
    nearest fallback where the 2x2 neighborhood leaves the extent.
    Mirrors fixtures._write_warp_expected (the nearest-mode pin)."""

    def build(tmp: str) -> dict:
        from gridfia_ray.fixtures import CRS, ORIGIN_X, ORIGIN_Y, PX, SCALES, build_cube
        from gridfia_ray.geo.crs import transform_bbox, transform_points
        from gridfia_ray.pipelines.warp import bilinear_blend

        scale = SCALES["t2"]
        cube, _ = build_cube(scale)
        n = scale.grid * scale.tile
        G = cube[1:].astype(np.float64).sum(axis=0)
        ext = float(n) * PX
        bbox = transform_bbox(
            (ORIGIN_X, ORIGIN_Y - ext, ORIGIN_X + ext, ORIGIN_Y), CRS, "EPSG:3857"
        )
        dst_px, D = 40.0, scale.tile
        dst_x0, dst_y0 = bbox[0], bbox[3]
        cell = dst_px * D

        def sample(px_x, px_y):
            v = np.full(px_x.size, np.nan)
            ok = (px_x >= 0) & (px_y >= 0) & (px_x < n) & (px_y < n)
            v[ok] = G[px_y[ok], px_x[ok]]
            return v

        n_cols = int(np.ceil((bbox[2] - bbox[0]) / cell)) + 2
        n_rows = int(np.ceil((bbox[3] - bbox[1]) / cell)) + 2
        rows = []
        for tr in range(n_rows):
            for tc in range(n_cols):
                xs = dst_x0 + (tc * D + np.arange(D) + 0.5) * dst_px
                ys = dst_y0 - (tr * D + np.arange(D) + 0.5) * dst_px
                gx = np.broadcast_to(xs[None, :], (D, D)).ravel()
                gy = np.broadcast_to(ys[:, None], (D, D)).ravel()
                sx, sy = transform_points(gx, gy, "EPSG:3857", CRS)
                nx = np.floor((sx - ORIGIN_X) / PX).astype(np.int64)
                ny = np.floor((ORIGIN_Y - sy) / PX).astype(np.int64)
                vals = sample(nx, ny)  # nearest fallback baseline
                fx = (sx - ORIGIN_X) / PX - 0.5
                fy = (ORIGIN_Y - sy) / PX - 0.5
                x0 = np.floor(fx).astype(np.int64)
                y0 = np.floor(fy).astype(np.int64)
                v00, v10 = sample(x0, y0), sample(x0 + 1, y0)
                v01, v11 = sample(x0, y0 + 1), sample(x0 + 1, y0 + 1)
                full = (
                    np.isfinite(v00) & np.isfinite(v10)
                    & np.isfinite(v01) & np.isfinite(v11)
                )
                vals = np.where(
                    full, bilinear_blend(v00, v10, v01, v11, fx - x0, fy - y0), vals
                )
                finite = np.isfinite(vals)
                if not finite.any():
                    continue
                sum_u = int(
                    np.floor(vals[finite] * 1_000_000 + 0.5).astype(np.int64).sum()
                )
                rows.append((tr, tc, int(finite.sum()), sum_u))
        exp = pa.table(
            {
                "tile_row": pa.array([r[0] for r in rows], pa.int64()),
                "tile_col": pa.array([r[1] for r in rows], pa.int64()),
                "n_valid": pa.array([r[2] for r in rows], pa.int64()),
                "sum_u": pa.array([r[3] for r in rows], pa.int64()),
            }
        )
        pq.write_table(exp, os.path.join(tmp, "expected.parquet"))
        return {"expected": "expected.parquet"}

    return _ensure_dir(f"warpblpin-v{GEN_VERSION}.{WARPBLPIN_V}", build)


def ensure_hspin() -> dict:
    """{'expected'} parquet path for the hillshade pipeline: total-
    biomass raster rebuilt INDEPENDENTLY from the fixture generator's
    pixel table (the same source every gf_* SQL oracle trusts), Horn
    gradient via plain numpy shifts (not the engine's halo exchange),
    then the shared shading leaf. ESRI's published worked example pins
    the leaf itself in tests/test_focal.py."""

    def build(tmp: str) -> dict:
        import pandas as pd

        from gridfia_ray import fixtures
        from gridfia_ray.pipelines.focal import hillshade_from_gradient

        d = fixtures.ensure_fixture("t2")
        meta = fixtures.fixture_meta("t2")
        n = meta["grid"] * meta["tile"]
        pixel_size = abs(meta["transform"][1])
        pix = pq.read_table(
            os.path.join(d, "pixels.parquet"),
            columns=["species_code", "y", "x", "biomass"],
        ).to_pandas()
        pix = pix[pix["species_code"] != "0000"]
        tot = pix.groupby(["y", "x"], as_index=False)["biomass"].sum()
        grid = np.zeros((n, n), dtype=np.int64)
        u = np.floor(tot["biomass"].to_numpy(np.float64) * 1_000_000 + 0.5)
        grid[tot["y"].to_numpy(), tot["x"].to_numpy()] = u.astype(np.int64)
        # Horn components over interior pixels via shifts
        a = grid[0:-2, 0:-2]; b = grid[0:-2, 1:-1]; c = grid[0:-2, 2:]
        dd = grid[1:-1, 0:-2]; f = grid[1:-1, 2:]
        g = grid[2:, 0:-2]; h = grid[2:, 1:-1]; i = grid[2:, 2:]
        ddx = (c + 2 * f + i) - (a + 2 * dd + g)
        ddy = (g + 2 * h + i) - (a + 2 * b + c)
        shade = hillshade_from_gradient(
            ddx.reshape(-1), ddy.reshape(-1), pixel_size
        )
        ys, xs = np.mgrid[1 : n - 1, 1 : n - 1]
        exp = pa.table(
            {
                "y": pa.array(ys.reshape(-1), pa.int64()),
                "x": pa.array(xs.reshape(-1), pa.int64()),
                "shade": pa.array(shade, pa.int64()),
            }
        )
        pq.write_table(exp, os.path.join(tmp, "expected.parquet"))
        return {"expected": "expected.parquet"}

    return _ensure_dir(f"hspin-v{GEN_VERSION}.{HSPIN_V}", build)


CCL_THRESHOLD = 50.0  # biomass threshold defining patch foreground
CCLPIN_V = 1


def ensure_cclpin() -> dict:
    """{'expected'} parquet for connected-component labeling: the
    total-biomass raster rebuilt independently from the fixture
    generator's pixel table, thresholded, then labeled by a plain
    single-process BFS flood fill (NOT the engine's run-based
    union-find / border-merge). Component id = the component's minimum
    linear pixel index y·W + x — the same partition-invariant canonical
    form the distributed pipeline emits, reachable by both
    implementations independently."""

    def build(tmp: str) -> dict:
        from collections import deque

        from gridfia_ray import fixtures

        d = fixtures.ensure_fixture("t2")
        meta = fixtures.fixture_meta("t2")
        n = meta["grid"] * meta["tile"]
        pix = pq.read_table(
            os.path.join(d, "pixels.parquet"),
            columns=["species_code", "y", "x", "biomass"],
        ).to_pandas()
        pix = pix[pix["species_code"] != "0000"]
        tot = pix.groupby(["y", "x"], as_index=False)["biomass"].sum()
        grid = np.zeros((n, n), dtype=np.int64)
        u = np.floor(tot["biomass"].to_numpy(np.float64) * 1_000_000 + 0.5)
        grid[tot["y"].to_numpy(), tot["x"].to_numpy()] = u.astype(np.int64)
        mask = grid > int(CCL_THRESHOLD * 1_000_000)
        comp = np.full((n, n), -1, np.int64)
        for sy, sx in zip(*np.nonzero(mask)):
            if comp[sy, sx] >= 0:
                continue
            anchor = int(sy) * n + int(sx)  # first scan hit = min y·W+x
            dq = deque([(int(sy), int(sx))])
            comp[sy, sx] = anchor
            while dq:
                cy, cx = dq.popleft()
                for ny, nx in ((cy - 1, cx), (cy + 1, cx), (cy, cx - 1), (cy, cx + 1)):
                    if 0 <= ny < n and 0 <= nx < n and mask[ny, nx] and comp[ny, nx] < 0:
                        comp[ny, nx] = anchor
                        dq.append((ny, nx))
        ys, xs = np.nonzero(comp >= 0)
        exp = pa.table(
            {
                "y": pa.array(ys.astype(np.int64)),
                "x": pa.array(xs.astype(np.int64)),
                "component": pa.array(comp[ys, xs]),
            }
        )
        pq.write_table(exp, os.path.join(tmp, "expected.parquet"))
        return {"expected": "expected.parquet"}

    return _ensure_dir(f"cclpin-v{GEN_VERSION}.{CCLPIN_V}", build)


CHANGEPIN_V = 1
CHANGE_THRESHOLD = 0.3  # units of |delta| that count as real change


def ensure_changepin() -> dict:
    """{'expected'} parquet for two-epoch change-patch detection: the
    year-0 → year-1 delta of the synthetic stack (pipelines/temporal.
    make_yearly_stack closed forms) rebuilt independently from the
    fixture generator's pixel table, |delta| thresholded, then labeled
    by the same plain BFS flood fill the CCL pin trusts (NOT the
    engine's union-find / border merge). delta(y, x) =
    coef(y, x) + ((31+x+y) mod 7000 − (x+y) mod 7000)."""

    def build(tmp: str) -> dict:
        from collections import deque

        from gridfia_ray import fixtures

        d = fixtures.ensure_fixture("t2")
        meta = fixtures.fixture_meta("t2")
        n = meta["grid"] * meta["tile"]
        yy, xx = np.mgrid[0:n, 0:n]
        yy = yy.astype(np.int64)
        xx = xx.astype(np.int64)
        coef = (yy * 2654435761 + xx * 40503) % 1_000_000 - 500_000
        delta = coef + ((31 + xx + yy) % 7000 - (xx + yy) % 7000)
        mask = np.abs(delta) > int(CHANGE_THRESHOLD * 1_000_000)
        comp = np.full((n, n), -1, np.int64)
        for sy, sx in zip(*np.nonzero(mask)):
            if comp[sy, sx] >= 0:
                continue
            anchor = int(sy) * n + int(sx)  # first scan hit = min y·W+x
            dq = deque([(int(sy), int(sx))])
            comp[sy, sx] = anchor
            while dq:
                cy, cx = dq.popleft()
                for ny, nx in ((cy - 1, cx), (cy + 1, cx), (cy, cx - 1), (cy, cx + 1)):
                    if 0 <= ny < n and 0 <= nx < n and mask[ny, nx] and comp[ny, nx] < 0:
                        comp[ny, nx] = anchor
                        dq.append((ny, nx))
        ys, xs = np.nonzero(comp >= 0)
        exp = pa.table(
            {
                "y": pa.array(ys.astype(np.int64)),
                "x": pa.array(xs.astype(np.int64)),
                "component": pa.array(comp[ys, xs]),
            }
        )
        pq.write_table(exp, os.path.join(tmp, "expected.parquet"))
        return {"expected": "expected.parquet"}

    return _ensure_dir(f"changepin-v{GEN_VERSION}.{CHANGEPIN_V}", build)


def ensure_ddqpin() -> dict:
    """{'rows', 'expected'} parquet paths for the grouped DDSketch
    quantiles: skewed per-group value distributions (lognormal tails,
    signed values, zeros, sub-unit magnitudes) plus the pinned
    estimates — a sequential replay of the bucket-key fold. Bucket
    counts merge by plain addition (order-free), so the distributed
    path must reproduce the replay bit-for-bit."""

    def build(tmp: str) -> dict:
        from gridfia_ray.analysis.sketches import (
            dd_bucket_keys,
            dd_quantiles_from_counts,
        )

        rng = np.random.RandomState(31)
        qs = [1.0, 50.0, 99.0]
        alpha = 0.01
        groups = {
            "latency": rng.lognormal(3, 1, 25_000),
            "delta": np.concatenate(
                [-rng.lognormal(0, 1, 2_000), np.zeros(100),
                 rng.uniform(0.01, 0.9, 900)]
            ),
            "tiny": rng.uniform(0.0, 2.0, 37),
        }
        g_col, v_col = [], []
        for g, v in groups.items():
            g_col.append(np.repeat(g, len(v)))
            v_col.append(v)
        rows = pa.table(
            {
                "grp": pa.array(np.concatenate(g_col), pa.string()),
                "v": pa.array(np.concatenate(v_col), pa.float64()),
            }
        )
        pq.write_table(rows, os.path.join(tmp, "rows.parquet"))
        exp_rows = []
        for g, v in groups.items():
            ks = dd_bucket_keys(v, alpha)
            uk, cnt = np.unique(ks, return_counts=True)
            vals = dd_quantiles_from_counts(uk, cnt, qs, alpha)
            exp_rows.append(
                {
                    "grp": g,
                    **{
                        f"q{('%g' % q).replace('.', '_')}_u": int(
                            np.floor(val * 1_000_000 + 0.5)
                        )
                        for q, val in zip(qs, vals)
                    },
                }
            )
        exp = pa.Table.from_pylist(exp_rows).cast(
            pa.schema(
                [("grp", pa.string()), ("q1_u", pa.int64()),
                 ("q50_u", pa.int64()), ("q99_u", pa.int64())]
            )
        )
        pq.write_table(exp.sort_by("grp"), os.path.join(tmp, "expected.parquet"))
        return {"rows": "rows.parquet", "expected": "expected.parquet"}

    return _ensure_dir(f"ddqpin-v{GEN_VERSION}.{DDQPIN_V}", build)


def _vidpin_clips() -> list[tuple[int, list[np.ndarray], float]]:
    """40 deterministic grayscale MJPEG clips: smooth drifting wave
    fields (JPEG-friendly), 3-10 frames, 1-8 fps, 16x16 to 48x32 px."""
    rng = np.random.RandomState(41)
    clips = []
    for cid in range(40):
        n = int(rng.randint(3, 11))
        fps = float(rng.choice([1.0, 2.0, 4.0, 8.0]))
        h = int(rng.choice([16, 24, 32]))
        w = int(rng.choice([16, 32, 40, 48]))
        fy, fx = rng.uniform(3, 8), rng.uniform(4, 9)
        phase = rng.uniform(0, 6.28)
        y, x = np.mgrid[0:h, 0:w]
        frames = [
            np.clip(
                120.0
                + 70.0 * np.sin(x / fx + phase + 0.7 * i)
                + 50.0 * np.cos(y / fy - 0.4 * i),
                0,
                255,
            )
            for i in range(n)
        ]
        clips.append((cid, frames, fps))
    return clips


def ensure_vidpin() -> dict:
    """{'clips', 'frames_expected'} parquet paths: MJPEG-in-BMFF video
    payloads plus the pinned per-frame stats — a sequential replay of
    exactly the container-parse + sample-select + T.81-decode math the
    distributed ``FrameSampleActor`` pool runs (mp4 graduated from the
    stub list; same standard as the wav/jpeg pins)."""

    def build(tmp: str) -> dict:
        from gridfia_ray.codecs.jpeg import encode_jpeg_gray
        from gridfia_ray.codecs.mp4 import (
            decode_frame_mjpeg,
            encode_mp4_mjpeg,
            parse_mp4,
            sample_index_at,
        )
        from gridfia_ray.codecs.phash import content_hash64

        n_frames_out = 4
        ids, bufs, rows = [], [], []
        for cid, frames, fps in _vidpin_clips():
            h, w = frames[0].shape
            jpegs = [encode_jpeg_gray(f, quality=95)[0] for f in frames]
            buf = encode_mp4_mjpeg(jpegs, width=w, height=h, fps=fps)
            ids.append(cid)
            bufs.append(buf)
            track = parse_mp4(buf)
            seg = max(1, track.duration_ms) / n_frames_out
            times = (np.arange(n_frames_out) * seg + seg / 2).astype(np.int64)
            for j, t in enumerate(times):
                arr = decode_frame_mjpeg(buf, track, sample_index_at(track, int(t)))
                pix = arr.astype("<f4").tobytes()
                rows.append(
                    {
                        "clip_id": cid,
                        "frame_idx": j,
                        "frame_ts_ms": int(t),
                        "h": arr.shape[0],
                        "w": arr.shape[1],
                        "px_sum_u": int(np.rint(float(arr.sum()) * 16.0)),
                        "px_min_u": int(np.rint(float(arr.min()) * 16.0)),
                        "px_max_u": int(np.rint(float(arr.max()) * 16.0)),
                        "pix_hash": int(content_hash64(pix) & 0x7FFFFFFFFFFFFFFF),
                    }
                )
        pq.write_table(
            pa.table(
                {
                    "image_id": pa.array([str(i) for i in ids], pa.string()),
                    "clip_id": pa.array(ids, pa.int64()),
                    "bytes": pa.array(bufs, pa.binary()),
                    "fmt": pa.array(["mp4"] * len(ids), pa.string()),
                }
            ),
            os.path.join(tmp, "clips.parquet"),
        )
        exp = pa.Table.from_pylist(rows).select(
            ["clip_id", "frame_idx", "frame_ts_ms", "h", "w",
             "px_sum_u", "px_min_u", "px_max_u", "pix_hash"]
        )
        exp = exp.cast(
            pa.schema(
                [
                    ("clip_id", pa.int64()),
                    ("frame_idx", pa.int64()),
                    ("frame_ts_ms", pa.int64()),
                    ("h", pa.int64()),
                    ("w", pa.int64()),
                    ("px_sum_u", pa.int64()),
                    ("px_min_u", pa.int64()),
                    ("px_max_u", pa.int64()),
                    ("pix_hash", pa.int64()),
                ]
            )
        )
        pq.write_table(
            exp.sort_by([("clip_id", "ascending"), ("frame_idx", "ascending")]),
            os.path.join(tmp, "frames_expected.parquet"),
        )
        return {"clips": "clips.parquet", "frames_expected": "frames_expected.parquet"}

    return _ensure_dir(f"vidpin-v{GEN_VERSION}.{VIDPIN_V}", build)


def _replay_pq_topk(
    vecs: np.ndarray,
    ids: np.ndarray,
    query_ids: list[int],
    m: int = 8,
    k: int = 10,
    sample_size: int = 2048,
    seed: int = 1234,
) -> pa.Table:
    """Sequential PQ train + encode + ADC search. The codebooks train
    on the driver in BOTH paths (train_pq's Lloyd runs on the sampled
    pool only), so reproducing the deterministic hash-sampled pool —
    rows ordered by splitmix64(vec_id) — makes books, codes, tables and
    scores bit-identical to the distributed run."""
    from gridfia_ray.ann.ivf import _splitmix64
    from gridfia_ray.ann.pq import _encode_matrix, train_books_from_pool
    from gridfia_ray.ann.search import _normalize

    vecs64 = np.asarray(vecs, np.float64)
    h = _splitmix64(ids.view(np.uint64) if ids.dtype == np.int64 else ids.astype(np.uint64))
    order = np.argsort(h, kind="stable")[:sample_size]
    pool = _normalize(vecs64[order])
    books = train_books_from_pool(pool, m, seed=seed)
    vn = _normalize(vecs64)
    codes = _encode_matrix(vn, books)
    pos = {int(d): i for i, d in enumerate(ids)}
    qn = _normalize(vecs64[[pos[q] for q in query_ids]])
    dsub = vecs64.shape[1] // m
    rows = []
    cols = np.arange(m)
    for qi, qid in enumerate(query_ids):
        tables = np.einsum(
            "sd,sjd->sj", qn[qi].reshape(m, dsub), books
        )
        scores = tables[cols[None, :], codes].sum(axis=1)
        df = (
            pa.table({"vec_id": pa.array(ids), "s": pa.array(scores)})
            .to_pandas()
            .sort_values(["s", "vec_id"], ascending=[False, True], kind="mergesort")
            .head(k)
        )
        for r, (_, row) in enumerate(df.iterrows(), start=1):
            rows.append(
                {
                    "query_id": int(qid),
                    "rank": r,
                    "vec_id": int(row["vec_id"]),
                    "adc_u": int(np.floor(row["s"] * 1e9 + 0.5)),
                }
            )
    t = pa.Table.from_pylist(rows)
    return t.cast(
        pa.schema(
            [("query_id", pa.int64()), ("rank", pa.int64()),
             ("vec_id", pa.int64()), ("adc_u", pa.int64())]
        )
    )


def _replay_ivfpq_topk(
    vecs: np.ndarray,
    ids: np.ndarray,
    query_ids: list[int],
    k_cells: int = 8,
    m: int = 8,
    k: int = 10,
    nprobe: int = 4,
    n_iters: int = 20,
    seed: int = 42,
    pq_sample_size: int = 2048,
    pq_seed: int = 1234,
) -> pa.Table:
    """Sequential IVF-PQ: the rounded-centroid k-means replay (same
    determinism argument as _replay_ivf_topk) partitions; the PQ replay
    (same pool/einsum argument as _replay_pq_topk) codes and scores,
    restricted to each query's probed cells."""
    from gridfia_ray.ann.ivf import _probe_cells, _splitmix64
    from gridfia_ray.ann.pq import _encode_matrix, train_books_from_pool
    from gridfia_ray.ann.search import _normalize

    vecs64 = np.asarray(vecs, np.float64)
    vn = _normalize(vecs64)
    c = _replay_kmeans(
        vecs64, ids, k_cells, n_iters, seed,
        4096, 9, 1e-6,
        train_size=max(4096, 256 * k_cells),  # build_ivfpq_index's arg
    )
    h = _splitmix64(ids.view(np.uint64) if ids.dtype == np.int64 else ids.astype(np.uint64))
    order = np.argsort(h, kind="stable")[:pq_sample_size]
    books = train_books_from_pool(_normalize(vecs64[order]), m, seed=pq_seed)
    codes = _encode_matrix(vn, books)
    cells = np.argmax(vn @ c.T, axis=1)
    pos = {int(d): i for i, d in enumerate(ids)}
    qn = _normalize(vecs64[[pos[q] for q in query_ids]])
    probes = _probe_cells(c, vecs64[[pos[q] for q in query_ids]], nprobe)
    dsub = vecs64.shape[1] // m
    cols = np.arange(m)
    rows = []
    for qi, qid in enumerate(query_ids):
        tables = np.einsum("sd,sjd->sj", qn[qi].reshape(m, dsub), books)
        mask = np.isin(cells, probes[qi])
        scores = tables[cols[None, :], codes[mask]].sum(axis=1)
        sub_ids = ids[mask]
        df = (
            pa.table({"vec_id": pa.array(sub_ids), "s": pa.array(scores)})
            .to_pandas()
            .sort_values(["s", "vec_id"], ascending=[False, True], kind="mergesort")
            .head(k)
        )
        for r, (_, row) in enumerate(df.iterrows(), start=1):
            rows.append(
                {
                    "query_id": int(qid),
                    "rank": r,
                    "vec_id": int(row["vec_id"]),
                    "adc_u": int(np.floor(row["s"] * 1e9 + 0.5)),
                }
            )
    return pa.Table.from_pylist(rows).cast(
        pa.schema(
            [("query_id", pa.int64()), ("rank", pa.int64()),
             ("vec_id", pa.int64()), ("adc_u", pa.int64())]
        )
    )


def ensure_annpin() -> dict:
    """{'embeddings', 'lsh_expected', 'neardup_expected', 'ivf_expected',
    'semantic_expected', 'pq_expected', 'ivfpq_expected'} parquet paths
    (cached, atomic)."""

    def build(tmp: str) -> dict:
        vecs, ids, labels = _annpin_arrays()
        emb = pa.FixedSizeListArray.from_arrays(
            pa.array(vecs.reshape(-1), pa.float32()), vecs.shape[1]
        )
        pq.write_table(
            pa.table(
                {
                    "vec_id": pa.array(ids),
                    "embedding": emb,
                    "label": pa.array(labels),
                }
            ),
            os.path.join(tmp, "embeddings.parquet"),
            row_group_size=512,
        )
        pq.write_table(
            _replay_lsh_topk(vecs, ids, ANN_PIN_QUERY_IDS),
            os.path.join(tmp, "lsh_expected.parquet"),
        )
        pq.write_table(
            _replay_near_dup(vecs, ids), os.path.join(tmp, "neardup_expected.parquet")
        )
        pq.write_table(
            _replay_ivf_topk(vecs, ids, ANN_PIN_QUERY_IDS),
            os.path.join(tmp, "ivf_expected.parquet"),
        )
        pq.write_table(
            _replay_semantic_dedup(vecs, ids),
            os.path.join(tmp, "semantic_expected.parquet"),
        )
        pq.write_table(
            _replay_pq_topk(vecs, ids, ANN_PIN_QUERY_IDS),
            os.path.join(tmp, "pq_expected.parquet"),
        )
        pq.write_table(
            _replay_ivfpq_topk(vecs, ids, ANN_PIN_QUERY_IDS),
            os.path.join(tmp, "ivfpq_expected.parquet"),
        )
        return {
            "embeddings": "embeddings.parquet",
            "lsh_expected": "lsh_expected.parquet",
            "neardup_expected": "neardup_expected.parquet",
            "ivf_expected": "ivf_expected.parquet",
            "semantic_expected": "semantic_expected.parquet",
            "pq_expected": "pq_expected.parquet",
            "ivfpq_expected": "ivfpq_expected.parquet",
        }

    return _ensure_dir(f"annpin-v{GEN_VERSION}.{ANNPIN_V}", build)


# ---------------------------------------------------------------------------
# BPE tokenizer-training pin: deterministic morphology-rich corpus and a
# fully independent SEQUENTIAL trainer replay (Counter-based, list-scan
# merge apply — no shared code with text/bpe.py's string-replace form)
# ---------------------------------------------------------------------------

BPEPIN_V = 1
BPE_PIN_MERGES = 40


def _bpepin_table() -> pa.Table:
    """320 deterministic docs of stem+suffix words (zipf-ish draws) so
    merges learn real morphology (stems, '</w>' suffix units)."""
    rng = np.random.RandomState(20240817)
    stems = [
        "forest", "biomass", "raster", "tile", "pixel", "zone", "species",
        "shannon", "carbon", "canopy", "growth", "sample", "grid", "plot",
    ]
    suffixes = ["", "s", "ing", "ed", "ation", "al"]
    sp = 1.0 / np.arange(1, len(stems) + 1) ** 1.3
    sp /= sp.sum()
    xp = 1.0 / np.arange(1, len(suffixes) + 1) ** 1.1
    xp /= xp.sum()
    ids, texts = [], []
    for d in range(320):
        n = 30 + int(rng.randint(0, 40))
        ws = [
            stems[rng.choice(len(stems), p=sp)]
            + suffixes[rng.choice(len(suffixes), p=xp)]
            for _ in range(n)
        ]
        ids.append(d)
        texts.append(" ".join(ws))
    return pa.table(
        {"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts, pa.string())}
    )


def _replay_bpe(texts: list[str], n_merges: int) -> tuple[pa.Table, list]:
    """Sequential BPE trainer: word Counter → per-round pair Counter →
    (max count, lexicographically smallest pair) → list-scan merge."""
    import re
    from collections import Counter

    wc: Counter = Counter()
    for t in texts:
        for w in re.findall(r"\S+", t):
            wc[w + "</w>"] += 1
    words = {
        w: (list(w[:-4]) + ["</w>"] if w.endswith("</w>") else list(w))
        for w in wc
    }
    merges = []
    for _ in range(n_merges):
        pc_: Counter = Counter()
        for w, syms in words.items():
            f = wc[w]
            for i in range(len(syms) - 1):
                pc_[(syms[i], syms[i + 1])] += f
        if not pc_:
            break
        best = min(pc_.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        for w, syms in words.items():
            if a not in syms:
                continue
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    tbl = pa.table(
        {
            "rank": pa.array(np.arange(len(merges)), pa.int64()),
            "left": pa.array([m[0] for m in merges], pa.string()),
            "right": pa.array([m[1] for m in merges], pa.string()),
        }
    )
    return tbl, merges


def _replay_bpe_counts(
    ids: np.ndarray, texts: list[str], merges: list
) -> pa.Table:
    """Per-doc token counts by replaying the merge list per word with
    the same list-scan apply."""
    import re

    cache: dict = {}

    def n_tokens(w: str) -> int:
        if w in cache:
            return cache[w]
        syms = list(w[:-4]) + ["</w>"] if w.endswith("</w>") else list(w)
        for a, b in merges:
            if a not in syms:
                continue
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        cache[w] = len(syms)
        return cache[w]

    counts = [
        sum(n_tokens(w + "</w>") for w in re.findall(r"\S+", t)) for t in texts
    ]
    return pa.table(
        {
            "doc_id": pa.array(np.asarray(ids, np.int64), pa.int64()),
            "n_tokens": pa.array(np.asarray(counts, np.int64), pa.int64()),
        }
    )


def ensure_bpepin() -> dict:
    """{'documents', 'merges_expected', 'counts_expected'} parquet
    paths (cached, atomic)."""

    def build(tmp: str) -> dict:
        docs = _bpepin_table()
        texts = docs["text"].to_pylist()
        pq.write_table(docs, os.path.join(tmp, "documents.parquet"))
        merges_tbl, merges = _replay_bpe(texts, BPE_PIN_MERGES)
        pq.write_table(merges_tbl, os.path.join(tmp, "merges_expected.parquet"))
        pq.write_table(
            _replay_bpe_counts(docs["doc_id"].to_numpy(), texts, merges),
            os.path.join(tmp, "counts_expected.parquet"),
        )
        return {
            "documents": "documents.parquet",
            "merges_expected": "merges_expected.parquet",
            "counts_expected": "counts_expected.parquet",
        }

    return _ensure_dir(f"bpepin-v{GEN_VERSION}.{BPEPIN_V}", build)


# ---------------------------------------------------------------------------
# content-defined chunking (CDC)
# ---------------------------------------------------------------------------

CDCPIN_V = 1
CDC_PIN_SIZES = (32, 64, 256)  # min / avg / max bytes


def _cdcpin_table() -> pa.Table:
    """160 deterministic docs exercising the CDC dedup property: 100
    base docs (200–3000 chars of word-ish text), 30 prefix-edited twins
    (insertion shifts every byte offset — fixed-size chunking loses all
    alignment, CDC must re-find the shared chunks) and 30 docs that
    splice a long passage from one base doc into another (cross-doc
    shared chunks)."""
    rng = np.random.RandomState(23)
    vocab = np.array([f"w{i:02d}" for i in range(80)])
    base: list[str] = []
    for _ in range(100):
        n_tok = int(rng.randint(50, 750))
        base.append(" ".join(vocab[rng.randint(0, 80, n_tok)]))
    texts = list(base)
    for i in range(30):
        ins = " ".join(vocab[rng.randint(0, 80, int(rng.randint(3, 20)))])
        texts.append(ins + " " + base[(i * 3) % 100])
    for i in range(30):
        donor = base[(i * 7) % 100]
        host = base[(i * 11 + 1) % 100]
        cutpoint = len(host) // 2
        texts.append(host[:cutpoint] + " " + donor[: max(160, len(donor) // 2)] + host[cutpoint:])
    return pa.table(
        {
            "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
            "text": pa.array(texts, pa.string()),
        }
    )


def _replay_cdc(ids: np.ndarray, texts: list[str]) -> pa.Table:
    """Byte-at-a-time gear walk — the textbook STATEFUL formulation
    ``h = (h << 1) + G[b] (mod 2^64)``, cutting at the first position
    ≥ min_size into the chunk where ``h & (avg-1) == 0``, forced at
    max_size — independent of the pipeline's 64-shifted-adds
    vectorization and sparse-candidate greedy walk (text/cdc.py). Only
    the gear table and the md5-64 chunk fingerprint are shared (they
    ARE the spec constants)."""
    import hashlib

    from gridfia_ray.text.cdc import gear_table

    min_size, avg_size, max_size = CDC_PIN_SIZES
    G = [int(x) for x in gear_table()]
    mask64 = (1 << 64) - 1
    amask = avg_size - 1
    r_ids, r_cks, r_sts, r_lns, r_hs = [], [], [], [], []

    def h64(b: bytes) -> int:
        v = int.from_bytes(hashlib.md5(b).digest()[:8], "big")
        return v - (1 << 64) if v >= 1 << 63 else v

    for doc_id, text in zip(ids, texts):
        data = text.encode("utf-8")
        h = 0
        start = 0
        cuts: list[int] = []
        for pos in range(len(data)):
            h = ((h << 1) + G[data[pos]]) & mask64
            size = pos + 1 - start
            if (size >= min_size and (h & amask) == 0) or size == max_size:
                cuts.append(pos + 1)
                start = pos + 1
        if start < len(data):
            cuts.append(len(data))
        start = 0
        for ck, end in enumerate(cuts):
            r_ids.append(int(doc_id))
            r_cks.append(ck)
            r_sts.append(start)
            r_lns.append(end - start)
            r_hs.append(h64(data[start:end]))
            start = end
    return pa.table(
        {
            "doc_id": pa.array(np.asarray(r_ids, np.int64), pa.int64()),
            "chunk_id": pa.array(np.asarray(r_cks, np.int64), pa.int64()),
            "start": pa.array(np.asarray(r_sts, np.int64), pa.int64()),
            "length": pa.array(np.asarray(r_lns, np.int64), pa.int64()),
            "chunk_hash": pa.array(np.asarray(r_hs, np.int64), pa.int64()),
        }
    )


def ensure_cdcpin() -> dict:
    """{'documents', 'cdc_expected'} parquet paths (cached, atomic)."""

    def build(tmp: str) -> dict:
        docs = _cdcpin_table()
        pq.write_table(docs, os.path.join(tmp, "documents.parquet"))
        pq.write_table(
            _replay_cdc(docs["doc_id"].to_numpy(), docs["text"].to_pylist()),
            os.path.join(tmp, "cdc_expected.parquet"),
        )
        return {
            "documents": "documents.parquet",
            "cdc_expected": "cdc_expected.parquet",
        }

    return _ensure_dir(f"cdcpin-v{GEN_VERSION}.{CDCPIN_V}", build)


# ---------------------------------------------------------------------------
# PCA fit + projection
# ---------------------------------------------------------------------------

PCAPIN_V = 1
PCA_PIN_K = 3
PCA_PIN_SCALE = 10**6


def _pcapin_table() -> pa.Table:
    """500 × 8 planted embeddings with an anisotropic, well-separated
    spectrum and a nonzero mean — eigenvectors are stable and the
    centering path is actually exercised."""
    rng = np.random.RandomState(31)
    x = rng.randn(500, 8) * np.linspace(3.0, 0.3, 8)[None, :]
    x += np.linspace(-1.0, 1.0, 8)[None, :]
    return pa.table(
        {
            "vec_id": pa.array(np.arange(500, dtype=np.int64)),
            "embedding": pa.array(
                [v.astype(np.float32) for v in x], pa.list_(pa.float32())
            ),
        }
    )


def _replay_pca_projection(tbl: pa.Table) -> pa.Table:
    """Sequential PCA replay: one full-matrix int64 moment computation
    (order-free — the int quantization is WHY the distributed partials
    are bit-identical), the same pinned-sign eigensolve spec, one
    full-matrix projection GEMM. Projections compare in µ-units (the
    repo's s6 convention) because per-batch vs full-matrix GEMMs may
    round differently at the last bit."""
    vecs = np.stack(
        [np.asarray(v, np.float32) for v in tbl["embedding"].to_pylist()]
    ).astype(np.float64)
    q = np.floor(vecs * PCA_PIN_SCALE + 0.5).astype(np.int64)
    n, d = q.shape
    gram = q.T @ q
    mean_q = q.sum(axis=0).astype(np.float64) / n
    cov = (gram.astype(np.float64) - n * np.outer(mean_q, mean_q)) / (n - 1)
    cov /= float(PCA_PIN_SCALE) ** 2
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:PCA_PIN_K]
    comps = evecs[:, order].T
    for r in range(comps.shape[0]):
        if comps[r, np.argmax(np.abs(comps[r]))] < 0:
            comps[r] = -comps[r]
    proj = (vecs - mean_q / PCA_PIN_SCALE) @ comps.T  # (n, k)
    ids = np.repeat(tbl["vec_id"].to_numpy(), PCA_PIN_K)
    pcs = np.tile(np.arange(PCA_PIN_K, dtype=np.int64), n)
    vals = np.floor(proj.ravel() * 1_000_000 + 0.5).astype(np.int64)
    return pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "pc_idx": pa.array(pcs, pa.int64()),
            "val_u": pa.array(vals, pa.int64()),
        }
    )


def ensure_pcapin() -> dict:
    """{'embeddings', 'pca_expected'} parquet paths (cached, atomic)."""

    def build(tmp: str) -> dict:
        tbl = _pcapin_table()
        pq.write_table(tbl, os.path.join(tmp, "embeddings.parquet"))
        pq.write_table(
            _replay_pca_projection(tbl), os.path.join(tmp, "pca_expected.parquet")
        )
        return {"embeddings": "embeddings.parquet", "pca_expected": "pca_expected.parquet"}

    return _ensure_dir(f"pcapin-v{GEN_VERSION}.{PCAPIN_V}", build)


# ---------------------------------------------------------------------------
# unicode normalization
# ---------------------------------------------------------------------------

NORMPIN_V = 1


def _normpin_table() -> pa.Table:
    """120 docs planted with every normalization hazard: decomposed
    accents (e + combining acute), precomposed twins, compatibility
    ligatures/fullwidth forms, NBSP vs space, mixed case — the inputs
    whose exact-hash dedup keys MUST collide after canonicalization.
    The oracle side is DuckDB's ICU ``nfc_normalize`` — an independent
    Unicode implementation, not a replay of ours."""
    rng = np.random.RandomState(41)
    hazards = [
        "école", "école",          # NFD vs NFC 'école'
        "café", "café",
        "ﬁnance", "finance",             # ﬁ ligature (NFKC-only)
        "４２", "42",                 # fullwidth digits
        "ÅNGSTRÖM", "ÅNGSTRÖM",
        "x y", "x y",                    # NBSP vs space
        "MiXeD CaSe", "mixed case",
    ]
    words = [f"w{i:02d}" for i in range(40)]
    texts = []
    for i in range(120):
        base = " ".join(np.random.RandomState(41 + i).choice(words, 8))
        texts.append(base + " " + hazards[i % len(hazards)])
    return pa.table(
        {
            "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
            "text": pa.array(texts, pa.string()),
        }
    )


def ensure_normpin() -> dict:
    """{'documents'} parquet path (cached, atomic). No expected table:
    the oracle computes nfc_normalize live in DuckDB/ICU."""

    def build(tmp: str) -> dict:
        pq.write_table(_normpin_table(), os.path.join(tmp, "documents.parquet"))
        return {"documents": "documents.parquet"}

    return _ensure_dir(f"normpin-v{GEN_VERSION}.{NORMPIN_V}", build)


FLOWPIN_V = 3  # v3: + strahler (descending-z order pass over the forest)


def ensure_flowpin() -> dict:
    """{'expected'} parquet for D8 flow routing: the total-biomass
    raster rebuilt independently from the fixture generator's pixel
    table, directions by a per-pixel priority-order scan, accumulation
    by a single GLOBAL descending-z push loop and basin labels by the
    mirrored ascending-z resolve — no tiling, no halo, no supersteps
    (the engine decomposes the same math into tile-local solves +
    cross-tile settling rounds; pipelines/flow.py). Basin id = the
    linear index y·N + x of the pit the cell drains to (a pit is its
    own basin)."""

    def build(tmp: str) -> dict:
        from gridfia_ray import fixtures
        from gridfia_ray.pipelines.flow import D8_OFFSETS

        d = fixtures.ensure_fixture("t2")
        meta = fixtures.fixture_meta("t2")
        n = meta["grid"] * meta["tile"]
        pix = pq.read_table(
            os.path.join(d, "pixels.parquet"),
            columns=["species_code", "y", "x", "biomass"],
        ).to_pandas()
        pix = pix[pix["species_code"] != "0000"]
        tot = pix.groupby(["y", "x"], as_index=False)["biomass"].sum()
        grid = np.zeros((n, n), dtype=np.int64)
        u = np.floor(tot["biomass"].to_numpy(np.float64) * 1_000_000 + 0.5)
        grid[tot["y"].to_numpy(), tot["x"].to_numpy()] = u.astype(np.int64)
        # directions: vectorized shifts, priority order = first max
        best_drop = np.zeros((n, n), dtype=np.int64)
        d8 = np.full((n, n), -1, dtype=np.int64)
        pad = np.zeros((n + 2, n + 2), dtype=np.int64)
        pad[1:-1, 1:-1] = grid
        pres = np.zeros((n + 2, n + 2), dtype=np.int64)
        pres[1:-1, 1:-1] = 1
        for code, (dy, dx) in enumerate(D8_OFFSETS):
            nz = pad[1 + dy : 1 + dy + n, 1 + dx : 1 + dx + n]
            np_ = pres[1 + dy : 1 + dy + n, 1 + dx : 1 + dx + n]
            drop = grid - nz
            better = (np_ == 1) & (drop > 0) & (drop > best_drop)
            best_drop[better] = drop[better]
            d8[better] = code
        # accumulation: one global topological (descending-z) push pass
        acc = np.zeros(n * n, dtype=np.int64)
        d8f = d8.ravel().tolist()
        accl = acc.tolist()
        order = np.argsort(-grid.ravel(), kind="stable")
        for lin in order.tolist():
            code = d8f[lin]
            if code < 0:
                continue
            dy, dx = D8_OFFSETS[code]
            y, x = divmod(lin, n)
            accl[(y + dy) * n + (x + dx)] += accl[lin] + 1
        # basins: ascending-z resolve (downstream is settled first)
        basin = [0] * (n * n)
        for lin in order.tolist()[::-1]:
            code = d8f[lin]
            if code < 0:
                basin[lin] = lin  # pit: its own basin
            else:
                dy, dx = D8_OFFSETS[code]
                y, x = divmod(lin, n)
                basin[lin] = basin[(y + dy) * n + (x + dx)]
        # Strahler: one more descending-z pass (headwaters order 1;
        # M+1 iff >= 2 inflows carry the max incoming order M)
        inmax = [0] * (n * n)
        incnt = [0] * (n * n)
        strahler = [0] * (n * n)
        for lin in order.tolist():
            o = 1 if inmax[lin] == 0 else inmax[lin] + (1 if incnt[lin] >= 2 else 0)
            strahler[lin] = o
            code = d8f[lin]
            if code < 0:
                continue
            dy, dx = D8_OFFSETS[code]
            y, x = divmod(lin, n)
            c = (y + dy) * n + (x + dx)
            if o > inmax[c]:
                inmax[c] = o
                incnt[c] = 1
            elif o == inmax[c]:
                incnt[c] += 1
        ys, xs = np.mgrid[0:n, 0:n]
        exp = pa.table(
            {
                "y": pa.array(ys.reshape(-1), pa.int64()),
                "x": pa.array(xs.reshape(-1), pa.int64()),
                "dir": pa.array(d8.reshape(-1), pa.int64()),
                "acc": pa.array(np.asarray(accl, dtype=np.int64), pa.int64()),
                "basin": pa.array(np.asarray(basin, dtype=np.int64), pa.int64()),
                "strahler": pa.array(np.asarray(strahler, dtype=np.int64), pa.int64()),
            }
        )
        pq.write_table(exp, os.path.join(tmp, "expected.parquet"))
        return {"expected": "expected.parquet"}

    return _ensure_dir(f"flowpin-v{GEN_VERSION}.{FLOWPIN_V}", build)


COSTPIN_V = 2  # v2: + backlink (first-min-wins D8 argmin over the dist grid)
COST_SOURCE_THRESHOLD = 150.0


def ensure_costpin() -> dict:
    """{'expected'} parquet for chamfer-3/4 cost distance: the
    total-biomass raster rebuilt independently from the fixture
    generator's pixel table, then a plain heapq DIJKSTRA over the
    8-connected grid with the identical integer link costs
    (3·(c(a)+c(b)) orthogonal, 4·(c(a)+c(b)) diagonal; sources =
    µ-value > threshold at distance 0) — no tiling, no halo, no
    supersteps (the engine decomposes the same metric into tile-local
    min-plus scans + cross-tile settling rounds; pipelines/costdist).
    """

    def build(tmp: str) -> dict:
        import heapq

        from gridfia_ray import fixtures

        d = fixtures.ensure_fixture("t2")
        meta = fixtures.fixture_meta("t2")
        n = meta["grid"] * meta["tile"]
        pix = pq.read_table(
            os.path.join(d, "pixels.parquet"),
            columns=["species_code", "y", "x", "biomass"],
        ).to_pandas()
        pix = pix[pix["species_code"] != "0000"]
        tot = pix.groupby(["y", "x"], as_index=False)["biomass"].sum()
        grid = np.zeros((n, n), dtype=np.int64)
        u = np.floor(tot["biomass"].to_numpy(np.float64) * 1_000_000 + 0.5)
        grid[tot["y"].to_numpy(), tot["x"].to_numpy()] = u.astype(np.int64)
        thr_u = int(np.floor(COST_SOURCE_THRESHOLD * 1_000_000 + 0.5))
        c = grid.ravel().tolist()
        INF = 1 << 62
        dist = [INF] * (n * n)
        heap = []
        for lin in np.nonzero(grid.ravel() > thr_u)[0].tolist():
            dist[lin] = 0
            heap.append((0, lin))
        if not heap:
            raise RuntimeError("costpin: no source pixel above threshold")
        heapq.heapify(heap)
        nbrs = [(-1, -1, 4), (-1, 0, 3), (-1, 1, 4), (0, -1, 3),
                (0, 1, 3), (1, -1, 4), (1, 0, 3), (1, 1, 4)]
        while heap:
            dd, lin = heapq.heappop(heap)
            if dd > dist[lin]:
                continue
            y, x = divmod(lin, n)
            cl = c[lin]
            for dy, dx, wgt in nbrs:
                ny, nx = y + dy, x + dx
                if 0 <= ny < n and 0 <= nx < n:
                    nl = ny * n + nx
                    nd = dd + wgt * (cl + c[nl])
                    if nd < dist[nl]:
                        dist[nl] = nd
                        heapq.heappush(heap, (nd, nl))
        # backlink: first-min-wins D8 argmin of dist(n) + w·(c(n)+c(p))
        # over the converged distance grid (the engine's identical rule)
        from gridfia_ray.pipelines.flow import D8_OFFSETS

        D = np.asarray(dist, dtype=np.int64).reshape(n, n)
        C = grid
        Dp = np.full((n + 2, n + 2), INF, np.int64)
        Cp = np.zeros((n + 2, n + 2), np.int64)
        Dp[1:-1, 1:-1] = D
        Cp[1:-1, 1:-1] = C
        best = np.full((n, n), INF, np.int64)
        code = np.full((n, n), -1, np.int64)
        for k, (dy, dx) in enumerate(D8_OFFSETS):
            wgt = 3 if dy == 0 or dx == 0 else 4
            cand = (
                Dp[1 + dy : 1 + dy + n, 1 + dx : 1 + dx + n]
                + wgt * (Cp[1 + dy : 1 + dy + n, 1 + dx : 1 + dx + n] + C)
            )
            better = cand < best
            best[better] = cand[better]
            code[better] = k
        code[D == 0] = -1
        ys, xs = np.mgrid[0:n, 0:n]
        exp = pa.table(
            {
                "y": pa.array(ys.reshape(-1).astype(np.int64)),
                "x": pa.array(xs.reshape(-1).astype(np.int64)),
                "cdist": pa.array(np.asarray(dist, dtype=np.int64)),
                "backlink": pa.array(code.reshape(-1)),
            }
        )
        pq.write_table(exp, os.path.join(tmp, "expected.parquet"))
        return {"expected": "expected.parquet"}

    return _ensure_dir(f"costpin-v{GEN_VERSION}.{COSTPIN_V}", build)


ALLOCPIN_V = 2  # v2: + least-cost path rows for the 5 pinned destinations
ALLOC_SOURCE_THRESHOLD = 151.0  # on the +1-shifted (strictly positive) grid


def ensure_allocpin() -> dict:
    """{'expected'} parquet for cost ALLOCATION: the +1.0-shifted
    total-biomass grid (strictly positive costs, the allocation
    precondition), sequential Dijkstra, the first-min-wins D8 backlink
    argmin, then every chain followed to its source in ascending-dist
    order (strict descent makes one pass exact) — no tiling, no border
    exchange (the engine labels the same field via the watershed
    machinery; pipelines/costdist.cost_allocation_tiles)."""

    def build(tmp: str) -> dict:
        import heapq

        from gridfia_ray import fixtures
        from gridfia_ray.pipelines.flow import D8_OFFSETS

        d = fixtures.ensure_fixture("t2")
        meta = fixtures.fixture_meta("t2")
        n = meta["grid"] * meta["tile"]
        pix = pq.read_table(
            os.path.join(d, "pixels.parquet"),
            columns=["species_code", "y", "x", "biomass"],
        ).to_pandas()
        pix = pix[pix["species_code"] != "0000"]
        tot = pix.groupby(["y", "x"], as_index=False)["biomass"].sum()
        grid = np.full((n, n), 1_000_000, dtype=np.int64)  # µ(v + 1.0)
        u = np.floor(tot["biomass"].to_numpy(np.float64) * 1_000_000 + 0.5)
        grid[tot["y"].to_numpy(), tot["x"].to_numpy()] += u.astype(np.int64)
        thr_u = int(np.floor(ALLOC_SOURCE_THRESHOLD * 1_000_000 + 0.5))
        c = grid.ravel().tolist()
        INF = 1 << 62
        dist = [INF] * (n * n)
        heap = []
        for lin in np.nonzero(grid.ravel() > thr_u)[0].tolist():
            dist[lin] = 0
            heap.append((0, lin))
        if not heap:
            raise RuntimeError("allocpin: no source pixel above threshold")
        heapq.heapify(heap)
        nbrs = [(-1, -1, 4), (-1, 0, 3), (-1, 1, 4), (0, -1, 3),
                (0, 1, 3), (1, -1, 4), (1, 0, 3), (1, 1, 4)]
        while heap:
            dd, lin = heapq.heappop(heap)
            if dd > dist[lin]:
                continue
            y, x = divmod(lin, n)
            cl = c[lin]
            for dy, dx, wgt in nbrs:
                ny, nx = y + dy, x + dx
                if 0 <= ny < n and 0 <= nx < n:
                    nl = ny * n + nx
                    nd = dd + wgt * (cl + c[nl])
                    if nd < dist[nl]:
                        dist[nl] = nd
                        heapq.heappush(heap, (nd, nl))
        D = np.asarray(dist, dtype=np.int64).reshape(n, n)
        Dp = np.full((n + 2, n + 2), INF, np.int64)
        Cp = np.zeros((n + 2, n + 2), np.int64)
        Dp[1:-1, 1:-1] = D
        Cp[1:-1, 1:-1] = grid
        best = np.full((n, n), INF, np.int64)
        code = np.full((n, n), -1, np.int64)
        for k, (dy, dx) in enumerate(D8_OFFSETS):
            wgt = 3 if dy == 0 or dx == 0 else 4
            cand = (
                Dp[1 + dy : 1 + dy + n, 1 + dx : 1 + dx + n]
                + wgt * (Cp[1 + dy : 1 + dy + n, 1 + dx : 1 + dx + n] + grid)
            )
            better = cand < best
            best[better] = cand[better]
            code[better] = k
        code[D == 0] = -1
        # ascending-dist chain resolve: downstream settles first
        alloc = np.full(n * n, -1, dtype=np.int64)
        codef = code.ravel().tolist()
        order = np.argsort(D.ravel(), kind="stable").tolist()
        for lin in order:
            k = codef[lin]
            if k < 0:
                alloc[lin] = lin  # source labels itself
            else:
                dy, dx = D8_OFFSETS[k]
                y, x = divmod(lin, n)
                alloc[lin] = alloc[(y + dy) * n + (x + dx)]
        ys, xs = np.mgrid[0:n, 0:n]
        exp = pa.table(
            {
                "y": pa.array(ys.reshape(-1).astype(np.int64)),
                "x": pa.array(xs.reshape(-1).astype(np.int64)),
                "alloc": pa.array(alloc),
            }
        )
        pq.write_table(exp, os.path.join(tmp, "expected.parquet"))
        # least-cost paths from the 5 pinned destinations (corners +
        # center): walk the same backlink field to its source
        rows = []
        for dest_id, (py, px) in enumerate(alloc_path_destinations(n)):
            y, x, step = py, px, 0
            while True:
                rows.append((dest_id, step, y, x))
                k = codef[y * n + x]
                if k < 0:
                    break
                dy, dx = D8_OFFSETS[k]
                y, x, step = y + dy, x + dx, step + 1
        r = np.asarray(rows, dtype=np.int64)
        paths = pa.table(
            {
                "dest_id": pa.array(r[:, 0]),
                "step": pa.array(r[:, 1]),
                "y": pa.array(r[:, 2]),
                "x": pa.array(r[:, 3]),
            }
        )
        pq.write_table(paths, os.path.join(tmp, "paths.parquet"))
        return {"expected": "expected.parquet", "paths": "paths.parquet"}

    return _ensure_dir(f"allocpin-v{GEN_VERSION}.{ALLOCPIN_V}", build)


def alloc_path_destinations(n: int) -> list[tuple[int, int]]:
    """The 5 pinned CostPath destinations: corners + center."""
    return [(0, 0), (0, n - 1), (n - 1, 0), (n - 1, n - 1), (n // 2, n // 2)]


COSTSRCPIN_V = 1


def ensure_costsrcpin() -> dict:
    """{'expected'} parquet for the DECOUPLED-source cost distance: the
    same heapq Dijkstra as ensure_costpin (total-biomass traversal
    costs), but sources = pixels where species 0131 is PRESENT
    (biomass > 0) — the ArcGIS two-raster form (separate source and
    cost layers)."""

    def build(tmp: str) -> dict:
        import heapq

        from gridfia_ray import fixtures

        d = fixtures.ensure_fixture("t2")
        meta = fixtures.fixture_meta("t2")
        n = meta["grid"] * meta["tile"]
        pix = pq.read_table(
            os.path.join(d, "pixels.parquet"),
            columns=["species_code", "y", "x", "biomass"],
        ).to_pandas()
        pix = pix[pix["species_code"] != "0000"]
        tot = pix.groupby(["y", "x"], as_index=False)["biomass"].sum()
        grid = np.zeros((n, n), dtype=np.int64)
        u = np.floor(tot["biomass"].to_numpy(np.float64) * 1_000_000 + 0.5)
        grid[tot["y"].to_numpy(), tot["x"].to_numpy()] = u.astype(np.int64)
        sp = pix[(pix["species_code"] == "0131") & (pix["biomass"] > 0)]
        src = np.zeros((n, n), dtype=bool)
        src[sp["y"].to_numpy(), sp["x"].to_numpy()] = True
        if not src.any():
            raise RuntimeError("costsrcpin: species 0131 never present")
        c = grid.ravel().tolist()
        INF = 1 << 62
        dist = [INF] * (n * n)
        heap = [(0, int(lin)) for lin in np.nonzero(src.ravel())[0]]
        for _, lin in heap:
            dist[lin] = 0
        heapq.heapify(heap)
        nbrs = [(-1, -1, 4), (-1, 0, 3), (-1, 1, 4), (0, -1, 3),
                (0, 1, 3), (1, -1, 4), (1, 0, 3), (1, 1, 4)]
        while heap:
            dd, lin = heapq.heappop(heap)
            if dd > dist[lin]:
                continue
            y, x = divmod(lin, n)
            cl = c[lin]
            for dy, dx, wgt in nbrs:
                ny, nx = y + dy, x + dx
                if 0 <= ny < n and 0 <= nx < n:
                    nl = ny * n + nx
                    nd = dd + wgt * (cl + c[nl])
                    if nd < dist[nl]:
                        dist[nl] = nd
                        heapq.heappush(heap, (nd, nl))
        ys, xs = np.mgrid[0:n, 0:n]
        exp = pa.table(
            {
                "y": pa.array(ys.reshape(-1).astype(np.int64)),
                "x": pa.array(xs.reshape(-1).astype(np.int64)),
                "cdist": pa.array(np.asarray(dist, dtype=np.int64)),
            }
        )
        pq.write_table(exp, os.path.join(tmp, "expected.parquet"))
        return {"expected": "expected.parquet"}

    return _ensure_dir(f"costsrcpin-v{GEN_VERSION}.{COSTSRCPIN_V}", build)


KRIGPIN_V = 2


def krigpin_model() -> dict:
    """The pinned variogram model shared verbatim by the distributed
    query and the sequential replay (the solve machinery differs; the
    model must not). Parameters are in the plot field's natural units —
    spherical with a range spanning ~⅓ of the 4096-unit domain."""
    return {"model": "spherical", "nugget": 2.0, "psill": 380.0, "range": 1400.0}


KRIG_PIN_K = 8
KRIG_PIN_CELL = 256.0


def krigpin_plots() -> dict:
    """300 deterministic plots over [0, 4096)² with a smooth spatially
    structured value (so the OK weights are non-trivial) — north-up
    domain (origin at top-left, y downward like the tile grid)."""
    rng = np.random.RandomState(7119)
    x = rng.uniform(0.0, 4096.0, 300)
    y = -rng.uniform(0.0, 4096.0, 300)  # north-up: world y ≤ origin_y=0
    v = (
        50.0
        + 30.0 * np.sin(x / 700.0)
        + 20.0 * np.cos(y / 900.0)
        + rng.normal(0.0, 2.0, 300)
    )
    return {"x": x, "y": y, "value": v}


def _replay_kriging(plots: dict, pts_x: np.ndarray, pts_y: np.ndarray) -> pa.Table:
    """Brute-force sequential ordinary kriging: full distance scan +
    stable (distance, plot index) top-k — independent of the pipeline's
    Z-order ring expansion — then the identical deterministic (k+1)²
    solve (same neighbor order ⇒ same matrix ⇒ same bits)."""
    from gridfia_ray.pipelines.kriging import model_gamma

    model = krigpin_model()
    k = KRIG_PIN_K
    px = np.asarray(plots["x"], np.float64)
    py = np.asarray(plots["y"], np.float64)
    pv = np.asarray(plots["value"], np.float64)
    preds, vars_, kused = [], [], []
    for qx, qy in zip(pts_x, pts_y):
        # rank by SQUARED distance exactly like pipelines/knn.KnnActor:
        # sqrt can collapse two distinct float64 d² values to equal
        # doubles, and a tie straddling the k-th boundary would then
        # pick a different neighbor set than the pipeline
        d2 = (px - qx) ** 2 + (py - qy) ** 2
        order = np.lexsort((np.arange(d2.size), d2))[:k]
        dk = np.sqrt(d2[order])
        kk = order.size
        dmat = np.sqrt(
            (px[order][:, None] - px[order][None, :]) ** 2
            + (py[order][:, None] - py[order][None, :]) ** 2
        )
        A = np.empty((kk + 1, kk + 1))
        A[:kk, :kk] = model_gamma(dmat, model)
        A[kk, :kk] = 1.0
        A[:kk, kk] = 1.0
        A[kk, kk] = 0.0
        b = np.empty(kk + 1)
        b[:kk] = model_gamma(dk, model)
        b[kk] = 1.0
        wl = np.linalg.solve(A, b)
        preds.append(float(wl[:kk] @ pv[order]))
        vars_.append(float(wl[:kk] @ b[:kk] + wl[kk]))
        kused.append(kk)
    u = 1_000_000
    return pa.table(
        {
            "point_id": pa.array(np.arange(pts_x.size, dtype=np.int64)),
            "pred_u": pa.array(
                np.floor(np.asarray(preds) * u + 0.5).astype(np.int64)
            ),
            "var_u": pa.array(
                np.floor(np.asarray(vars_) * u + 0.5).astype(np.int64)
            ),
            "k_used": pa.array(np.asarray(kused, dtype=np.int64)),
        }
    )


def ensure_krigpin() -> dict:
    """{'plots', 'points', 'expected'} parquet paths for ordinary
    kriging (pipelines/kriging.py): a 20×20 prediction grid over the
    plot domain, expected = the sequential brute-force replay."""

    def build(tmp: str) -> dict:
        plots = krigpin_plots()
        pq.write_table(
            pa.table({c: pa.array(v) for c, v in plots.items()}),
            os.path.join(tmp, "plots.parquet"),
        )
        g = 20
        step = 4096.0 / g
        jj, ii = np.meshgrid(np.arange(g), np.arange(g))  # ii=row, jj=col
        pts_x = (jj.reshape(-1) + 0.5) * step
        pts_y = -(ii.reshape(-1) + 0.5) * step
        pts = pa.table(
            {
                "point_id": pa.array(np.arange(g * g, dtype=np.int64)),
                "x": pa.array(pts_x),
                "y": pa.array(pts_y),
            }
        )
        pq.write_table(pts, os.path.join(tmp, "points.parquet"))
        pq.write_table(
            _replay_kriging(plots, pts_x, pts_y),
            os.path.join(tmp, "expected.parquet"),
        )
        return {
            "plots": "plots.parquet",
            "points": "points.parquet",
            "expected": "expected.parquet",
        }

    return _ensure_dir(f"krigpin-v{GEN_VERSION}.{KRIGPIN_V}", build)


DIVPIN_V = 1
DIV_PIN_M = 24


def divpin_embeddings() -> tuple[np.ndarray, np.ndarray]:
    """(ids int64, vecs f32 (1500, 24)): 8 deterministic gaussian
    clusters of unequal spread — k-center greedy must hop clusters
    before refining within one, so the selection order is a real test
    of the global argmax fold."""
    rng = np.random.RandomState(4242)
    centers = rng.uniform(-5.0, 5.0, (8, 24))
    asg = rng.randint(0, 8, 1500)
    vecs = centers[asg] + rng.normal(0.0, 0.6 + 0.1 * asg[:, None], (1500, 24))
    return np.arange(1500, dtype=np.int64), vecs.astype(np.float32)


def _replay_kcenter(ids: np.ndarray, vecs: np.ndarray, m: int) -> pa.Table:
    """Sequential farthest-first traversal on the full matrix —
    independent of the streaming per-block winner fold; shares only the
    per-point distance formula (ann/diversity._dist2, euclidean) so the
    float bits match."""
    from gridfia_ray.ann.diversity import _dist2

    mat = np.asarray(vecs, dtype=np.float64)
    seed_i = int(np.argmin(ids))
    picks = [(0, int(ids[seed_i]), -1)]
    mind = _dist2(mat, mat[seed_i], "euclidean")
    for r in range(1, m):
        top = mind.max()
        if top == 0.0:
            break  # only duplicate embeddings remain (same rule as the
            # pipeline: never emit duplicate vec_ids)
        cand = np.nonzero(mind == top)[0]
        i = int(cand[np.argmin(ids[cand])])
        picks.append(
            (r, int(ids[i]), int(np.floor(float(mind[i]) * 1_000_000 + 0.5)))
        )
        mind = np.minimum(mind, _dist2(mat, mat[i], "euclidean"))
    return pa.table(
        {
            "rank": pa.array([p[0] for p in picks], pa.int64()),
            "vec_id": pa.array([p[1] for p in picks], pa.int64()),
            "radius2_u": pa.array([p[2] for p in picks], pa.int64()),
        }
    )


def ensure_divpin() -> dict:
    """{'embeddings', 'expected'} parquet for k-center greedy diversity
    selection (ann/diversity.kcenter_select, euclidean, m=24)."""

    def build(tmp: str) -> dict:
        ids, vecs = divpin_embeddings()
        pq.write_table(
            pa.table(
                {
                    "vec_id": pa.array(ids),
                    "embedding": pa.array(
                        list(vecs), pa.list_(pa.float32())
                    ),
                }
            ),
            os.path.join(tmp, "embeddings.parquet"),
        )
        pq.write_table(
            _replay_kcenter(ids, vecs, DIV_PIN_M),
            os.path.join(tmp, "expected.parquet"),
        )
        return {"embeddings": "embeddings.parquet", "expected": "expected.parquet"}

    return _ensure_dir(f"divpin-v{GEN_VERSION}.{DIVPIN_V}", build)


VIEWPIN_V = 1
VIEW_RADIUS = 16
VIEW_EYE_U = 50_000_000.0  # 50 elevation units in the µ-scaled domain


def viewpin_observers(n: int) -> np.ndarray:
    """(m, 2) global (y, x) observer cells: a 3×3 interior lattice plus
    two near-edge observers (exercise the clamped-support and
    missing-strip paths)."""
    base = [
        (n // 6 + i * (n // 3), n // 6 + j * (n // 3))
        for i in range(3)
        for j in range(3)
    ]
    base += [(2, 2), (n - 3, n // 2)]
    return np.asarray(base, dtype=np.int64)


def ensure_viewpin() -> dict:
    """{'expected'} parquet for the bounded-radius viewshed
    (pipelines/viewshed.viewshed_tiles over the t2 total-biomass
    raster): the SAME los_visible kernel applied sequentially to the
    full µ-grid — what the pin verifies is the halo exchange and the
    observer-to-tile routing."""

    def build(tmp: str) -> dict:
        from gridfia_ray import fixtures
        from gridfia_ray.pipelines.viewshed import los_visible

        d = fixtures.ensure_fixture("t2")
        meta = fixtures.fixture_meta("t2")
        n = meta["grid"] * meta["tile"]
        pix = pq.read_table(
            os.path.join(d, "pixels.parquet"),
            columns=["species_code", "y", "x", "biomass"],
        ).to_pandas()
        pix = pix[pix["species_code"] != "0000"]
        tot = pix.groupby(["y", "x"], as_index=False)["biomass"].sum()
        grid = np.zeros((n, n), dtype=np.int64)
        u = np.floor(tot["biomass"].to_numpy(np.float64) * 1_000_000 + 0.5)
        grid[tot["y"].to_numpy(), tot["x"].to_numpy()] = u.astype(np.int64)
        E = grid.astype(np.float64)
        count = np.zeros((n, n), dtype=np.int64)
        for oy, ox in viewpin_observers(n):
            count += los_visible(E, int(oy), int(ox), VIEW_RADIUS, VIEW_EYE_U)
        ys, xs = np.mgrid[0:n, 0:n]
        pq.write_table(
            pa.table(
                {
                    "y": pa.array(ys.reshape(-1).astype(np.int64)),
                    "x": pa.array(xs.reshape(-1).astype(np.int64)),
                    "n_vis": pa.array(count.reshape(-1)),
                }
            ),
            os.path.join(tmp, "expected.parquet"),
        )
        return {"expected": "expected.parquet"}

    return _ensure_dir(f"viewpin-v{GEN_VERSION}.{VIEWPIN_V}", build)


FILLPIN_V = 1


def ensure_fillpin() -> dict:
    """{'expected'} parquet for depression filling (pipelines/fill.
    fill_sinks_tiles over the t2 total-biomass raster): an INDEPENDENT
    sequential Priority-Flood (Barnes et al. 2014, heapq from the
    border inward, W(n) = max(E(n), pop level)) — equal to the
    Planchon-Darboux least fixpoint the distributed relaxation
    computes; int64 arithmetic makes the agreement bit-exact."""

    def build(tmp: str) -> dict:
        import heapq

        from gridfia_ray import fixtures

        d = fixtures.ensure_fixture("t2")
        meta = fixtures.fixture_meta("t2")
        n = meta["grid"] * meta["tile"]
        pix = pq.read_table(
            os.path.join(d, "pixels.parquet"),
            columns=["species_code", "y", "x", "biomass"],
        ).to_pandas()
        pix = pix[pix["species_code"] != "0000"]
        tot = pix.groupby(["y", "x"], as_index=False)["biomass"].sum()
        E = np.zeros((n, n), dtype=np.int64)
        u = np.floor(tot["biomass"].to_numpy(np.float64) * 1_000_000 + 0.5)
        E[tot["y"].to_numpy(), tot["x"].to_numpy()] = u.astype(np.int64)
        INF = 1 << 60
        W = np.full((n, n), INF, dtype=np.int64)
        visited = np.zeros((n, n), dtype=bool)
        heap = []
        for y in range(n):
            for x in (0, n - 1):
                W[y, x] = E[y, x]
                heap.append((int(E[y, x]), y, x))
        for x in range(1, n - 1):
            for y in (0, n - 1):
                W[y, x] = E[y, x]
                heap.append((int(E[y, x]), y, x))
        heapq.heapify(heap)
        while heap:
            wl, y, x = heapq.heappop(heap)
            if visited[y, x]:
                continue
            visited[y, x] = True
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    ny, nx = y + dy, x + dx
                    if (dy or dx) and 0 <= ny < n and 0 <= nx < n \
                            and not visited[ny, nx]:
                        cand = max(int(E[ny, nx]), wl)
                        if cand < W[ny, nx]:
                            W[ny, nx] = cand
                            heapq.heappush(heap, (cand, ny, nx))
        ys, xs = np.mgrid[0:n, 0:n]
        pq.write_table(
            pa.table(
                {
                    "y": pa.array(ys.reshape(-1).astype(np.int64)),
                    "x": pa.array(xs.reshape(-1).astype(np.int64)),
                    "fill_u": pa.array(W.reshape(-1)),
                    "depth_u": pa.array((W - E).reshape(-1)),
                }
            ),
            os.path.join(tmp, "expected.parquet"),
        )
        return {"expected": "expected.parquet"}

    return _ensure_dir(f"fillpin-v{GEN_VERSION}.{FILLPIN_V}", build)


FLOWFILLPIN_V = 4  # v4: + the stream power index column
TWI_TANB_FLOOR = 1e-3  # slope floor for pits (dir = -1, drop = 0)


def spi_values(acc: np.ndarray, drop_u: np.ndarray, diag: np.ndarray) -> np.ndarray:
    """Stream power index (a·tanβ, unclamped — 0 at pits): the erosion
    companion of TWI, same shared elementwise contract."""
    dist = np.where(np.asarray(diag, np.float64) == 1.0, np.sqrt(2.0), 1.0)
    tanb = np.asarray(drop_u, np.float64) * 1e-6 / dist
    return (np.asarray(acc, np.float64) + 1.0) * tanb


def twi_values(acc: np.ndarray, drop_u: np.ndarray, diag: np.ndarray) -> np.ndarray:
    """ln((acc+1) / max(tanβ, floor)) with tanβ = µ-drop / unit D8
    distance (pixel units; √2 on diagonals) — the ONE float formula the
    distributed composition and the sequential replay share, elementwise
    so the bits are independent of row order."""
    dist = np.where(np.asarray(diag, np.float64) == 1.0, np.sqrt(2.0), 1.0)
    tanb = np.maximum(
        np.asarray(drop_u, np.float64) * 1e-6 / dist, TWI_TANB_FLOOR
    )
    return np.log((np.asarray(acc, np.float64) + 1.0) / tanb)


def ensure_flowfillpin() -> dict:
    """{'expected'} parquet for hydrologically-conditioned D8 routing:
    an INDEPENDENT sequential Priority-Flood-ε fill (Barnes et al.
    2014 §4.2, ε = 1 µ-unit so every off-border cell keeps a strict
    descent) then the flowpin direction/accumulation replay ON THE
    FILLED surface — the composition gf_flow_filled must reproduce
    through fill_sinks_tiles(as_result_tiles=True, eps_u=1) →
    flow_direction_packed → flow_accumulate."""

    def build(tmp: str) -> dict:
        import heapq

        from gridfia_ray import fixtures
        from gridfia_ray.pipelines.flow import D8_OFFSETS

        d = fixtures.ensure_fixture("t2")
        meta = fixtures.fixture_meta("t2")
        n = meta["grid"] * meta["tile"]
        pix = pq.read_table(
            os.path.join(d, "pixels.parquet"),
            columns=["species_code", "y", "x", "biomass"],
        ).to_pandas()
        pix = pix[pix["species_code"] != "0000"]
        tot = pix.groupby(["y", "x"], as_index=False)["biomass"].sum()
        E = np.zeros((n, n), dtype=np.int64)
        u = np.floor(tot["biomass"].to_numpy(np.float64) * 1_000_000 + 0.5)
        E[tot["y"].to_numpy(), tot["x"].to_numpy()] = u.astype(np.int64)
        INF = 1 << 60
        Wg = np.full((n, n), INF, dtype=np.int64)
        visited = np.zeros((n, n), dtype=bool)
        heap = []
        for y in range(n):
            for x in (0, n - 1):
                Wg[y, x] = E[y, x]
                heap.append((int(E[y, x]), y, x))
        for x in range(1, n - 1):
            for y in (0, n - 1):
                Wg[y, x] = E[y, x]
                heap.append((int(E[y, x]), y, x))
        heapq.heapify(heap)
        while heap:
            wl, y, x = heapq.heappop(heap)
            if visited[y, x]:
                continue
            visited[y, x] = True
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    ny, nx = y + dy, x + dx
                    if (dy or dx) and 0 <= ny < n and 0 <= nx < n \
                            and not visited[ny, nx]:
                        cand = max(int(E[ny, nx]), wl + 1)  # ε = 1
                        if cand < Wg[ny, nx]:
                            Wg[ny, nx] = cand
                            heapq.heappush(heap, (cand, ny, nx))
        # the engine hands flow a float64-units tile re-µ-scaled by the
        # flow stage — floor(fill_u·1e-6·1e6 + 0.5) == fill_u exactly
        grid = Wg
        best_drop = np.zeros((n, n), dtype=np.int64)
        d8 = np.full((n, n), -1, dtype=np.int64)
        pad = np.zeros((n + 2, n + 2), dtype=np.int64)
        pad[1:-1, 1:-1] = grid
        pres = np.zeros((n + 2, n + 2), dtype=np.int64)
        pres[1:-1, 1:-1] = 1
        for code, (dy, dx) in enumerate(D8_OFFSETS):
            nz = pad[1 + dy : 1 + dy + n, 1 + dx : 1 + dx + n]
            np_ = pres[1 + dy : 1 + dy + n, 1 + dx : 1 + dx + n]
            drop = grid - nz
            better = (np_ == 1) & (drop > 0) & (drop > best_drop)
            best_drop[better] = drop[better]
            d8[better] = code
        acc = [0] * (n * n)
        d8f = d8.ravel().tolist()
        order = np.argsort(-grid.ravel(), kind="stable")
        for lin in order.tolist():
            code = d8f[lin]
            if code < 0:
                continue
            dy, dx = D8_OFFSETS[code]
            y, x = divmod(lin, n)
            acc[(y + dy) * n + (x + dx)] += acc[lin] + 1
        # D8 receiver geometry + TWI on the filled surface (same
        # shifted-array loop shape as the pipeline's drop kernel)
        dropg = np.zeros((n, n), dtype=np.int64)
        diagg = np.zeros((n, n), dtype=np.int64)
        for code, (dy, dx) in enumerate(D8_OFFSETS):
            m = d8 == code
            if not m.any():
                continue
            nz = pad[1 + dy : 1 + dy + n, 1 + dx : 1 + dx + n]
            dropg[m] = grid[m] - nz[m]
            diagg[m] = code % 2
        acca = np.asarray(acc, dtype=np.int64)
        twi = twi_values(acca, dropg.reshape(-1), diagg.reshape(-1))
        twi_u = np.floor(twi * 1_000_000 + 0.5).astype(np.int64)
        spi = spi_values(acca, dropg.reshape(-1), diagg.reshape(-1))
        spi_u = np.floor(spi * 1_000_000 + 0.5).astype(np.int64)
        ys, xs = np.mgrid[0:n, 0:n]
        pq.write_table(
            pa.table(
                {
                    "y": pa.array(ys.reshape(-1), pa.int64()),
                    "x": pa.array(xs.reshape(-1), pa.int64()),
                    "dir": pa.array(d8.reshape(-1), pa.int64()),
                    "acc": pa.array(acca, pa.int64()),
                    "drop_u": pa.array(dropg.reshape(-1), pa.int64()),
                    "diag": pa.array(diagg.reshape(-1), pa.int64()),
                    "twi_u": pa.array(twi_u, pa.int64()),
                    "spi_u": pa.array(spi_u, pa.int64()),
                }
            ),
            os.path.join(tmp, "expected.parquet"),
        )
        return {"expected": "expected.parquet"}

    return _ensure_dir(f"flowfillpin-v{GEN_VERSION}.{FILLPIN_V}.{FLOWFILLPIN_V}", build)


DINFPIN_V = 2  # v2: flow angle normalized into [0, 2π)


def ensure_dinfpin() -> dict:
    """{'expected'} parquet for D∞ (Tarboton) flow: directions via the
    SAME elementwise dinf_directions kernel on the full padded grid
    (sharing it is the point — facet math must match bit-for-bit), then
    an independent sequential descending-z fixed-point push (floor
    (w·A)>>16 per receiver) with no tiling/supersteps. What the pin
    verifies is the packed exchange and the cross-tile settling."""

    def build(tmp: str) -> dict:
        from gridfia_ray import fixtures
        from gridfia_ray.pipelines.flow import (
            D8_OFFSETS,
            DINF_SCALE,
            DINF_W_ONE,
            dinf_directions,
        )

        d = fixtures.ensure_fixture("t2")
        meta = fixtures.fixture_meta("t2")
        n = meta["grid"] * meta["tile"]
        pix = pq.read_table(
            os.path.join(d, "pixels.parquet"),
            columns=["species_code", "y", "x", "biomass"],
        ).to_pandas()
        pix = pix[pix["species_code"] != "0000"]
        tot = pix.groupby(["y", "x"], as_index=False)["biomass"].sum()
        grid = np.zeros((n, n), dtype=np.int64)
        u = np.floor(tot["biomass"].to_numpy(np.float64) * 1_000_000 + 0.5)
        grid[tot["y"].to_numpy(), tot["x"].to_numpy()] = u.astype(np.int64)
        pad = np.zeros((n + 2, n + 2), dtype=np.int64)
        pad[1:-1, 1:-1] = grid
        pres = np.zeros((n + 2, n + 2), dtype=np.int64)
        pres[1:-1, 1:-1] = 1
        d1, d2, w1, ang = dinf_directions(pad, pres, n, n)
        acc = [DINF_SCALE] * (n * n)
        d1f = d1.ravel().tolist()
        d2f = d2.ravel().tolist()
        w1f = w1.ravel().tolist()
        for lin in np.argsort(-grid.ravel(), kind="stable").tolist():
            a = acc[lin]
            y, x = divmod(lin, n)
            for code, wgt in ((d1f[lin], w1f[lin]),
                              (d2f[lin], DINF_W_ONE - w1f[lin])):
                if code < 0 or wgt <= 0:
                    continue
                push = (wgt * a) >> 16
                if push <= 0:
                    continue
                dy, dx = D8_OFFSETS[code]
                acc[(y + dy) * n + (x + dx)] += push
        ys, xs = np.mgrid[0:n, 0:n]
        pq.write_table(
            pa.table(
                {
                    "y": pa.array(ys.reshape(-1), pa.int64()),
                    "x": pa.array(xs.reshape(-1), pa.int64()),
                    "angle_u": pa.array(ang.reshape(-1), pa.int64()),
                    "acc_fp": pa.array(
                        np.asarray(acc, dtype=np.int64), pa.int64()
                    ),
                }
            ),
            os.path.join(tmp, "expected.parquet"),
        )
        return {"expected": "expected.parquet"}

    return _ensure_dir(f"dinfpin-v{GEN_VERSION}.{DINFPIN_V}", build)


FLOWLENPIN_V = 1


def ensure_flowlenpin() -> dict:
    """{'expected'} parquet for upstream flow length: D8 directions via
    the flowpin shifted-scan replay, then an independent sequential
    descending-z max-plus push with the same integer step constants
    (ortho 10⁶, diag 1414214 µ-cells)."""

    def build(tmp: str) -> dict:
        from gridfia_ray import fixtures
        from gridfia_ray.pipelines.flow import (
            D8_OFFSETS,
            FLOWLEN_DIAG,
            FLOWLEN_ORTH,
        )

        d = fixtures.ensure_fixture("t2")
        meta = fixtures.fixture_meta("t2")
        n = meta["grid"] * meta["tile"]
        pix = pq.read_table(
            os.path.join(d, "pixels.parquet"),
            columns=["species_code", "y", "x", "biomass"],
        ).to_pandas()
        pix = pix[pix["species_code"] != "0000"]
        tot = pix.groupby(["y", "x"], as_index=False)["biomass"].sum()
        grid = np.zeros((n, n), dtype=np.int64)
        u = np.floor(tot["biomass"].to_numpy(np.float64) * 1_000_000 + 0.5)
        grid[tot["y"].to_numpy(), tot["x"].to_numpy()] = u.astype(np.int64)
        best_drop = np.zeros((n, n), dtype=np.int64)
        d8 = np.full((n, n), -1, dtype=np.int64)
        pad = np.zeros((n + 2, n + 2), dtype=np.int64)
        pad[1:-1, 1:-1] = grid
        pres = np.zeros((n + 2, n + 2), dtype=np.int64)
        pres[1:-1, 1:-1] = 1
        for code, (dy, dx) in enumerate(D8_OFFSETS):
            nz = pad[1 + dy : 1 + dy + n, 1 + dx : 1 + dx + n]
            np_ = pres[1 + dy : 1 + dy + n, 1 + dx : 1 + dx + n]
            drop = grid - nz
            better = (np_ == 1) & (drop > 0) & (drop > best_drop)
            best_drop[better] = drop[better]
            d8[better] = code
        ln = [0] * (n * n)
        d8f = d8.ravel().tolist()
        for lin in np.argsort(-grid.ravel(), kind="stable").tolist():
            code = d8f[lin]
            if code < 0:
                continue
            step = FLOWLEN_DIAG if code % 2 == 1 else FLOWLEN_ORTH
            dy, dx = D8_OFFSETS[code]
            y, x = divmod(lin, n)
            c = (y + dy) * n + (x + dx)
            cand = ln[lin] + step
            if cand > ln[c]:
                ln[c] = cand
        ys, xs = np.mgrid[0:n, 0:n]
        pq.write_table(
            pa.table(
                {
                    "y": pa.array(ys.reshape(-1), pa.int64()),
                    "x": pa.array(xs.reshape(-1), pa.int64()),
                    "flen_u": pa.array(np.asarray(ln, dtype=np.int64), pa.int64()),
                }
            ),
            os.path.join(tmp, "expected.parquet"),
        )
        return {"expected": "expected.parquet"}

    return _ensure_dir(f"flowlenpin-v{GEN_VERSION}.{FLOWLENPIN_V}", build)


CLAHEPIN_V = 1
CLAHE_BINS = 64
CLAHE_LEVELS = 256


def ensure_clahepin() -> dict:
    """{'expected'} parquet for CLAHE over the t2 total-biomass raster:
    shares the per-tile LUT kernel (pipelines/clahe.tile_lut — the
    shared-primitive convention) and reimplements the center-bilinear
    blending sequentially over the full grid with plain scalar loops —
    what the pin verifies is the LUT exchange and the neighbor
    routing."""

    def build(tmp: str) -> dict:
        from gridfia_ray import fixtures
        from gridfia_ray.pipelines.clahe import tile_lut

        d = fixtures.ensure_fixture("t2")
        meta = fixtures.fixture_meta("t2")
        T = meta["tile"]
        nt = meta["grid"]
        n = nt * T
        pix = pq.read_table(
            os.path.join(d, "pixels.parquet"),
            columns=["species_code", "y", "x", "biomass"],
        ).to_pandas()
        pix = pix[pix["species_code"] != "0000"]
        tot = pix.groupby(["y", "x"], as_index=False)["biomass"].sum()
        E = np.zeros((n, n), dtype=np.int64)
        u = np.floor(tot["biomass"].to_numpy(np.float64) * 1_000_000 + 0.5)
        E[tot["y"].to_numpy(), tot["x"].to_numpy()] = u.astype(np.int64)
        lo, hi = int(E.min()), int(E.max())
        width = hi - lo + 1
        luts = {
            (tr, tc): tile_lut(
                E[tr * T:(tr + 1) * T, tc * T:(tc + 1) * T],
                lo, width, CLAHE_BINS, 2, 1, CLAHE_LEVELS,
            )
            for tr in range(nt)
            for tc in range(nt)
        }
        out = np.zeros((n, n), dtype=np.int64)
        for y in range(n):
            ay = y - T // 2
            t0r, pyv = divmod(ay, T)
            for x in range(n):
                ax = x - T // 2
                t0c, pxv = divmod(ax, T)
                b = ((int(E[y, x]) - lo) * CLAHE_BINS) // width
                s = 0
                for oy, wy in ((t0r, T - pyv), (t0r + 1, pyv)):
                    ty = min(max(oy, 0), nt - 1)
                    for ox, wx in ((t0c, T - pxv), (t0c + 1, pxv)):
                        tx = min(max(ox, 0), nt - 1)
                        s += wy * wx * int(luts[(ty, tx)][b])
                out[y, x] = s // (T * T)
        ys, xs = np.mgrid[0:n, 0:n]
        pq.write_table(
            pa.table(
                {
                    "y": pa.array(ys.reshape(-1), pa.int64()),
                    "x": pa.array(xs.reshape(-1), pa.int64()),
                    "level": pa.array(out.reshape(-1), pa.int64()),
                }
            ),
            os.path.join(tmp, "expected.parquet"),
        )
        return {"expected": "expected.parquet"}

    return _ensure_dir(f"clahepin-v{GEN_VERSION}.{CLAHEPIN_V}", build)
