"""Persistent MinHash-LSH index for incremental NEAR-dup dedup.

``state/hash_index.py`` answers "is this exact content already in the
corpus?" across daily landings; this module answers the same question
for NEAR-duplicates: the base corpus' minhash band buckets live on
disk, partitioned so landing an increment reads ONLY the band buckets
its own documents hash into — never the base corpus, never the whole
index.

Layout (hive-partitioned, atomic writes):

    <dir>/band=<b>/part=<p>/*.parquet   (bh, doc_id, sig) rows,
                                        p = bh % num_parts
    <dir>/_META.json                    {"num_parts": P}

Each row carries the doc's FULL 64-hash signature (512 B), duplicated
across its 12 band rows — the duplication (~6 KB/doc) buys candidate
verification inside the same pruned read, with no second exchange; at
extreme scale the signature column can move to its own doc-keyed
table at the cost of one more pruned fetch (documented tradeoff).

Verification contract: a candidate pair matches when the fraction of
EQUAL signature components ≥ ``tau`` — the standard signature-
estimated Jaccard (E[matches/k] = J).  This is the approximate sibling
of ``minhash_lsh_pairs``' exact token-set verify: at k=64 the
estimator's σ is ~0.04 near J=0.9, and re-landed identical documents
always estimate J=1.  Approximate by design → pytest-pinned (re-land
idempotence, clone detection, pruning proof), no SQL oracle.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd

from ..ops.dedup import (LSH_BANDS, MINHASH_K, _token_set,
                         batch_band_hashes, batch_minhash_signatures)

META = "_META.json"


def _sig_rows(pdf: pd.DataFrame, num_parts: int) -> pd.DataFrame:
    """One (band, bh, part, doc_id, sig) row per doc per band."""
    toks = [_token_set(t) for t in pdf["text"]]
    sigs = batch_minhash_signatures(toks)
    bhs = batch_band_hashes(sigs)
    n = len(pdf)
    sig_bytes = [sigs[i].tobytes() for i in range(n)]
    return pd.DataFrame({
        "band": np.tile(np.arange(LSH_BANDS, dtype=np.int64), n),
        "bh": bhs.reshape(-1),
        "doc_id": np.repeat(pdf["doc_id"].to_numpy(), LSH_BANDS),
        "sig": np.repeat(np.asarray(sig_bytes, dtype=object),
                         LSH_BANDS),
    }).assign(part=lambda d: d["bh"] % num_parts)


def build_lsh_index(docs, index_dir: str, num_parts: int = 32) -> None:
    """One pass over the base corpus → band-bucket rows on disk,
    hive-partitioned (band, part); atomic publish (tmp + rename).

    Every write block intersects every hive partition (a block's docs
    hash into all bands/parts), so the raw write leaves ~n_blocks
    files per partition — thousands of KB-sized files whose per-file
    open/metadata cost then dominates the landing's pruned read.  A
    partition-LOCAL compaction pass (one task per (band, part) dir, no
    exchange) merges them into ~``_COMPACT_TARGET_BYTES`` files before
    the atomic publish."""
    import shutil

    tmp = index_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    (docs.map_batches(lambda b: _sig_rows(b, num_parts),
                      batch_format="pandas")
     .write_parquet(tmp, partition_cols=["band", "part"]))
    compact_lsh_index(tmp)
    with open(os.path.join(tmp, META), "w") as f:
        json.dump({"num_parts": num_parts}, f)
    shutil.rmtree(index_dir, ignore_errors=True)
    os.rename(tmp, index_dir)


# merged index files aim at this size — small enough that a pruned
# partition read stays parallel, large enough that per-file overhead
# is noise (row-group scale)
_COMPACT_TARGET_BYTES = 64 << 20


def _partition_dirs(index_dir: str) -> list[str]:
    out = []
    for band in sorted(os.listdir(index_dir)):
        bd = os.path.join(index_dir, band)
        if not (band.startswith("band=") and os.path.isdir(bd)):
            continue
        out.extend(os.path.join(bd, p) for p in sorted(os.listdir(bd))
                   if p.startswith("part="))
    return out


def _compact_dir(d: str, target_bytes: int) -> int:
    """Merge one partition dir's parquet files into ~target-sized
    files.  Safe to re-run: previous ``compact-*`` outputs join the
    merge set as ordinary inputs and every output gets a UNIQUE name
    (never ``os.replace`` over an earlier compact file, which would
    silently delete its rows — found by review).  Crash
    mid-compaction (only possible on a LIVE index via append-path
    compaction — the build compacts inside its unpublished tmp dir)
    is healed by a per-output INPUT MANIFEST, published before the
    merged file: the next compaction of the dir replays any manifest
    whose output exists (deleting listed leftover inputs — the rows
    live on in the merged file) and discards any whose output never
    published — so a crash between ``os.replace`` and the input
    removals costs transient duplicate rows (tolerated by the landing
    verify: a base row can only re-set the same match flag), never
    permanent index bloat."""
    import uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    # heal prior crashes: replay / discard leftover manifests
    for junk in [f for f in os.listdir(d)
                 if f.endswith(".inputs.json.tmp")]:
        os.remove(os.path.join(d, junk))
    for mf in [f for f in sorted(os.listdir(d))
               if f.endswith(".inputs.json")]:
        mpath = os.path.join(d, mf)
        out = os.path.join(d, mf[:-len(".inputs.json")] + ".parquet")
        if os.path.exists(out):           # merge published → drop inputs
            with open(mpath) as fh:
                for name in json.load(fh):
                    leftover = os.path.join(d, name)
                    if os.path.exists(leftover):
                        os.remove(leftover)
        else:                             # merge never published
            if os.path.exists(out + ".tmp"):
                os.remove(out + ".tmp")
        os.remove(mpath)

    files = [os.path.join(d, f) for f in sorted(os.listdir(d))
             if f.endswith(".parquet")]
    if len(files) <= 1:
        return 0
    # greedy runs of small files up to the target size
    runs, run, run_bytes = [], [], 0
    for f in files:
        sz = os.path.getsize(f)
        if run and run_bytes + sz > target_bytes:
            runs.append(run)
            run, run_bytes = [], 0
        run.append(f)
        run_bytes += sz
    if run:
        runs.append(run)
    merged = 0
    for r in runs:
        if len(r) <= 1:
            continue
        tbl = pa.concat_tables([pq.read_table(f) for f in r])
        out = os.path.join(d, f"compact-{uuid.uuid4().hex}.parquet")
        # manifest first (fsync'd by close), merged file second, input
        # removals third, manifest removal last — every crash point
        # replays cleanly (see docstring)
        manifest = out[:-len(".parquet")] + ".inputs.json"
        with open(manifest + ".tmp", "w") as fh:
            json.dump([os.path.basename(f) for f in r], fh)
        os.replace(manifest + ".tmp", manifest)
        pq.write_table(tbl, out + ".tmp")
        os.replace(out + ".tmp", out)
        for f in r:
            os.remove(f)
        os.remove(manifest)
        merged += len(r)
    return merged


def compact_lsh_index(index_dir: str,
                      target_bytes: int = _COMPACT_TARGET_BYTES) -> int:
    """Merge every (band, part) partition's small parquet files —
    build writes and repeated append-path landings both fragment the
    index.  Partition-local (one Ray task per dir, no exchange);
    returns the number of files merged away."""
    import ray

    dirs = _partition_dirs(index_dir)
    if not dirs:
        return 0
    fn = ray.remote(num_cpus=1)(_compact_dir)
    return sum(ray.get([fn.remote(d, target_bytes) for d in dirs]))


def _read_index_partitions(index_dir: str, needed: set[tuple[int, int]]):
    """Dataset of (band, bh, doc_id, sig) from ONLY the named
    (band, part) hive partitions."""
    import ray.data as rd

    paths = []
    for band, part in sorted(needed):
        d = os.path.join(index_dir, f"band={band}", f"part={part}")
        if os.path.isdir(d):
            paths.extend(os.path.join(d, f)
                         for f in sorted(os.listdir(d))
                         if f.endswith(".parquet"))
    if not paths:
        return rd.from_pandas(pd.DataFrame({
            "bh": pd.Series([], dtype="int64"),
            "doc_id": pd.Series([], dtype="int64"),
            "sig": pd.Series([], dtype=object)}))
    return rd.read_parquet(paths, columns=["bh", "doc_id", "sig"])


def _match_any(qs: np.ndarray, cs: np.ndarray, tau: float,
               mask: np.ndarray | None = None) -> np.ndarray:
    """Per row of (nq, K) ``qs``: True when ANY row of (nc, K) ``cs``
    agrees on ≥ ``tau`` of the K signature components — the
    signature-estimated Jaccard of the module docstring, in one
    place.  ``mask`` (nq, nc) limits which pairs count.  The
    candidate axis is chunked so the (nq, c, K) equality temp stays
    ~32 MiB."""
    out = np.zeros(len(qs), dtype=bool)
    step = max(1, (1 << 25) // max(1, len(qs) * MINHASH_K))
    for lo in range(0, len(cs), step):
        agree = ((qs[:, None, :] == cs[None, lo:lo + step, :])
                 .mean(axis=2) >= tau)
        if mask is not None:
            agree &= mask[:, lo:lo + step]
        out |= agree.any(axis=1)
    return out


def incremental_minhash_dedup(new, index_dir: str, tau: float = 0.9,
                              append: bool = False,
                              num_buckets: int | None = None):
    """Land an increment against the on-disk LSH index → one verdict
    row per NEW doc: (doc_id, keep) — keep=0 when a base document (or
    an earlier, smaller-id document of the same increment) shares a
    band bucket AND the signature-estimated Jaccard ≥ ``tau``.

    Scale shape: the increment's (band, part) set is the one small
    driver collect (≤ 12 × num_parts pairs); the index read is pruned
    to those partitions; candidates co-locate through ONE bounded-
    bucket exchange keyed (band, bh) where verification is a
    vectorized signature compare; the per-doc verdict folds through a
    second bounded exchange (max of per-bucket match flags).  With
    ``append=True`` the surviving docs' band rows are written back, so
    re-landing the same increment yields keep=0 everywhere.
    """
    from ..ops.shuffle import bucketed_agg, bucketed_groupby

    num_parts = _index_meta(index_dir)
    new_rows = new.map_batches(
        lambda b: _sig_rows(b, num_parts).assign(side="n"),
        batch_format="pandas").materialize()

    # pyarrow batches here: a pandas batch would convert each block's
    # 512 B-per-row ``sig`` object column just to throw it away
    # (measured 4× the whole pass); Arrow's select + group_by touch
    # only the two int columns
    def _distinct_parts(t):
        import pyarrow as pa  # noqa: F401
        return (t.select(["band", "part"])
                .group_by(["band", "part"]).aggregate([]))

    needed: set[tuple[int, int]] = set()
    for row in new_rows.map_batches(
            _distinct_parts, batch_format="pyarrow").take_all():
        needed.add((int(row["band"]), int(row["part"])))

    base = _read_index_partitions(index_dir, needed)
    # base rows need band for the key; the read drops the hive cols,
    # so recompute nothing — key on bh alone WITHIN a band-filtered
    # read would lose band separation; instead carry band from the
    # partition path via per-partition reads... simpler: the bh
    # already mixes the band index into its seed (batch_band_hashes),
    # so (bh) alone is collision-safe across bands by construction.
    base_k = base.map_batches(
        lambda b: pd.DataFrame({
            "bh": b["bh"].astype("int64"),
            "doc_id": b["doc_id"].astype("int64"),
            "sig": b["sig"], "side": "b"}),
        batch_format="pandas")
    new_k = new_rows.map_batches(
        lambda b: pd.DataFrame({
            "bh": b["bh"].astype("int64"),
            "doc_id": b["doc_id"].astype("int64"),
            "sig": b["sig"], "side": "n"}),
        batch_format="pandas")

    def verify(pdf: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, g in pdf.groupby("bh", sort=False):
            nn = g[g["side"] == "n"]
            if nn.empty:
                continue
            bb = g[g["side"] == "b"]
            n_sig = np.frombuffer(
                b"".join(nn["sig"]), dtype=np.uint64).reshape(
                len(nn), MINHASH_K)
            matched = np.zeros(len(nn), dtype=bool)
            if not bb.empty:
                b_sig = np.frombuffer(
                    b"".join(bb["sig"]), dtype=np.uint64).reshape(
                    len(bb), MINHASH_K)
                matched |= _match_any(n_sig, b_sig, tau)
            # within-increment: a new doc matching any SMALLER-id new
            # doc of the same bucket is a dup (strict-lower-triangle
            # mask over the id sort)
            ids = nn["doc_id"].to_numpy()
            if len(ids) > 1:
                order = np.argsort(ids, kind="stable")
                s = n_sig[order]
                n = len(ids)
                earlier = np.tri(n, k=-1, dtype=bool)
                matched[order] |= _match_any(s, s, tau, mask=earlier)
            outs.append(pd.DataFrame({"doc_id": ids,
                                      "m": matched.astype("int64")}))
        if not outs:
            return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                 "m": pd.Series([], dtype="int64")})
        return pd.concat(outs, ignore_index=True)

    flags = bucketed_groupby(base_k.union(new_k), "bh", verify,
                             num_buckets)
    verdict = bucketed_agg(flags, "doc_id", {"m": ("m", "max")},
                           num_buckets).map_batches(
        lambda b: pd.DataFrame({
            "doc_id": b["doc_id"].astype("int64"),
            "keep": (1 - b["m"]).astype("int64")}),
        batch_format="pandas")

    if append:
        from ..ops.shuffle import bucketed_join

        verdict = verdict.materialize()
        keepers = verdict.map_batches(
            lambda b: b.loc[b["keep"] == 1, ["doc_id"]],
            batch_format="pandas")
        # increment-proportional, so the keeper set rides a bucketed
        # SEMI join, never a driver-side set
        surviving = bucketed_join(
            new_rows.map_batches(
                lambda b: b[["band", "bh", "doc_id", "sig", "part"]],
                batch_format="pandas"),
            keepers, on="doc_id",
            left_schema={"band": "int64", "bh": "int64",
                         "doc_id": "int64", "sig": "object",
                         "part": "int64"},
            right_schema={"doc_id": "int64"},
            num_buckets=num_buckets, how="semi")
        surviving.write_parquet(index_dir,
                                partition_cols=["band", "part"])
    return verdict


def _index_meta(index_dir: str) -> int:
    with open(os.path.join(index_dir, META)) as f:
        return int(json.load(f)["num_parts"])


def append_to_lsh_index(docs, index_dir: str) -> None:
    """Fold a (surviving) document set's band rows into an existing
    index — the publish-then-append half of a landing job (the CLI
    publishes data FIRST so a crash between the two re-lands the
    increment as duplicates-of-nothing rather than losing it)."""
    num_parts = _index_meta(index_dir)
    (docs.map_batches(lambda b: _sig_rows(b, num_parts),
                      batch_format="pandas")
     .write_parquet(index_dir, partition_cols=["band", "part"]))
