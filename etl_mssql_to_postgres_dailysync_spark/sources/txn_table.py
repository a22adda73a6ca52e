"""TxnTable — a minimal ACID table format over parquet (Delta-protocol style).

The reference gets atomicity from the target database (one transaction around
the staging TRUNCATE/append + MERGE, csv_to_mssqldb.py:447-466; rollback on
load error, dags/mssql_to_postgresql_orders_daily.py:322,340-343).  When the
engine of record is a parquet lake there is no database to lean on, so this
module supplies the same guarantees the lake-table formats (Delta Lake,
Iceberg — public protocol designs) do, in miniature:

  * **Commit log**: `_txn_log/<version>.json`, one JSON document per commit
    holding `add`/`remove` file actions + operation metadata.  The table
    state at version V is the replay of actions 0..V — data files are
    immutable and never listed from the filesystem (object-store LIST is
    both slow and eventually consistent at 100 TB).
  * **Atomic, optimistically-concurrent commits**: a commit materializes as
    an atomic hard-link of a fully-written temp file into the next version
    slot; the link fails if the slot is taken.  Blind appends retry on top
    of the new head (they commute); read-modify-write ops (overwrite /
    merge / compact) raise `ConcurrentWriteError` because their snapshot is
    stale — the caller re-runs on the new head.  (On S3-like stores the
    exclusive-create becomes a CAS against a log service, as in Delta's
    commit coordinators; the protocol is unchanged.)
  * **File-level stats pruning (zone maps)**: each `add` records per-file
    min/max/null-count for the indexed columns, computed with ONE Spark job
    over the freshly written files.  `read(prune=("col", lo, hi))` skips
    files whose range cannot overlap — the metadata-driven analog of hive
    partition pruning, but it also works for value-clustered columns
    (`cluster_by=` range-partitions the write so ranges stay tight).
  * **Time travel**: `read(version=k)` replays the log only to k.
  * **Checkpoints**: every `checkpoint_interval` commits the full live set
    is written to `<version>.checkpoint.json`, so snapshot construction is
    O(interval) log reads, not O(history).
  * **Compaction & vacuum**: `compact()` rewrites the live set into few
    large files as a normal commit (history intact); `vacuum()` physically
    deletes files unreferenced by every retained version.

Scale notes: the log holds file *metadata* only (a 100 TB table at 1 GB
files is ~100k add-actions — megabytes of JSON, checkpointed); data moves
through ordinary parquet scans, so every Catalyst optimization (pushdown,
pruning, vectorized read) applies unchanged to `read()` output.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import uuid
from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

LOG_DIR = "_txn_log"
LOG_WIDTH = 20


class ConcurrentWriteError(RuntimeError):
    """A read-modify-write commit lost the race; re-run on the new head."""


class ConstraintViolation(ValueError):
    """A write contained rows failing a table CHECK constraint."""


@dataclass
class AddFile:
    path: str  # relative to table root
    rows: int
    stats: dict  # col -> {"min": v, "max": v, "nulls": n}
    partition_values: dict | None = None  # identity-partition col -> value
    bucket: int | None = None  # hash-bucket id under bucket_spec


def _version_path(log: str, v: int, checkpoint: bool = False) -> str:
    suffix = ".checkpoint.json" if checkpoint else ".json"
    return os.path.join(log, f"{v:0{LOG_WIDTH}d}{suffix}")


class TxnTable:
    def __init__(self, spark: SparkSession, path: str, stats_cols: Sequence[str] = (),
                 checkpoint_interval: int = 10):
        self.spark = spark
        self.path = os.path.abspath(path)
        self.log = os.path.join(self.path, LOG_DIR)
        self.stats_cols = list(stats_cols)
        self.checkpoint_interval = checkpoint_interval
        os.makedirs(self.log, exist_ok=True)

    # ---------------------------------------------------------------- log --

    def version(self) -> int:
        """Head version, -1 if the table has no commits."""
        vs = [int(os.path.basename(p).split(".")[0])
              for p in glob.glob(os.path.join(self.log, "*.json"))
              if not p.endswith(".checkpoint.json")]
        return max(vs, default=-1)

    def _read_commit(self, v: int) -> dict:
        with open(_version_path(self.log, v)) as f:
            return json.load(f)

    def history(self) -> list[dict]:
        return [
            {k: c[k] for k in ("version", "op", "meta")}
            for v in range(self.version() + 1)
            for c in [self._read_commit(v)]
        ]

    def _snapshot(self, version: int | None = None) -> tuple[dict[str, dict], dict | None]:
        """Replay the log to ``version``: {rel_path: add_action}, schema."""
        live, schema, _ = self._snapshot_full(version)
        return live, schema

    def _snapshot_full(
        self, version: int | None = None
    ) -> tuple[dict[str, dict], dict | None, dict]:
        """Replay to ``version``: (live files, schema, table properties).

        Properties carry the CURRENT partition/bucket spec (Iceberg-style
        spec evolution: the latest commit that declared a spec wins, but
        files keep the metadata of the spec they were written under)."""
        head = self.version()
        if version is None:
            version = head
        if version > head or version < -1:
            raise ValueError(f"version {version} out of range (head={head})")
        start, live, schema, props = 0, {}, None, {}
        # start from the newest checkpoint at or below the target version
        for v in range(version, -1, -1):
            cp = _version_path(self.log, v, checkpoint=True)
            if os.path.exists(cp):
                with open(cp) as f:
                    snap = json.load(f)
                live = {a["path"]: a for a in snap["live"]}
                schema = snap["schema"]
                props = snap.get("props", {})
                start = v + 1
                break
        for v in range(start, version + 1):
            c = self._read_commit(v)
            if c.get("schema"):
                schema = c["schema"]
            props.update(c.get("props") or {})
            for action in c["actions"]:
                if "add" in action:
                    live[action["add"]["path"]] = action["add"]
                elif "remove" in action:
                    live.pop(action["remove"]["path"], None)
        return live, schema, props

    def version_at(self, ts: float) -> int:
        """Newest version committed at-or-before the wall-clock timestamp
        (Delta's ``TIMESTAMP AS OF``): a scan of commit-doc timestamps —
        metadata only. Returns -1 when the table predates nothing."""
        head = self.version()
        best = -1
        for v in range(head + 1):
            if self._read_commit(v).get("ts", float("inf")) <= ts:
                best = v
            else:
                break  # commit timestamps are monotone (single log)
        return best

    def read_as_of(self, ts: float) -> DataFrame:
        """Time travel by timestamp: read the snapshot as of wall-clock ts."""
        v = self.version_at(ts)
        if v < 0:
            raise ValueError(f"no commit at or before ts={ts}")
        return self.read(version=v)

    def partition_spec(self, version: int | None = None) -> list[str]:
        """Current identity-partition columns ([] = unpartitioned)."""
        return self._snapshot_full(version)[2].get("partition_spec", [])

    # -------------------------------------------------------- constraints --

    def checks(self, version: int | None = None) -> dict[str, str]:
        """Active CHECK constraints: {name: sql_predicate}."""
        return dict(self._snapshot_full(version)[2].get("checks", {}))

    def set_check(self, name: str, predicate: str) -> int:
        """ADD/replace a CHECK constraint (Delta ``ALTER TABLE … ADD
        CONSTRAINT``): a SQL predicate every row of every future write must
        satisfy. EXISTING data is validated once here (one scan); from then
        on each write validates only its own incoming rows — the historical
        data is already known-good, so enforcement cost stays proportional
        to the write, not the table."""
        base = self.version()
        live, schema, props = self._snapshot_full(base)
        if live:
            self._enforce({name: predicate},
                          self._read_add_files(list(live.values()), schema))
        checks = dict(props.get("checks", {}))
        checks[name] = predicate
        return self._commit("set_check", [], base + 1, schema,
                            {"name": name, "predicate": predicate},
                            props={"checks": checks})

    def drop_check(self, name: str) -> int:
        base = self.version()
        _, schema, props = self._snapshot_full(base)
        checks = dict(props.get("checks", {}))
        checks.pop(name, None)
        return self._commit("drop_check", [], base + 1, schema,
                            {"name": name}, props={"checks": checks})

    def _enforce(self, checks: dict[str, str], df: DataFrame) -> None:
        """One aggregation counting violators of EVERY check at once
        (count_if per predicate — a single pass however many constraints
        exist); raises on the first named violation."""
        if not checks:
            return
        names = sorted(checks)
        # standard SQL CHECK: only a FALSE predicate violates (NULL passes);
        # count_if(NOT pred) counts exactly the FALSE rows (NOT NULL = NULL
        # is not counted)
        row = df.select([
            F.count_if(~F.expr(checks[n])).alias(f"c{i}")
            for i, n in enumerate(names)
        ]).first()
        for i, n in enumerate(names):
            if row[f"c{i}"]:
                raise ConstraintViolation(
                    f"check '{n}' ({checks[n]}) fails for {row[f'c{i}']} "
                    "incoming row(s)")

    def bucket_spec(self, version: int | None = None) -> dict | None:
        """Current hash-bucket layout, e.g. {"col": "k", "n": 8}, or None."""
        return self._snapshot_full(version)[2].get("bucket_spec")

    def _commit(self, op: str, actions: list[dict], expected_version: int,
                schema: dict | None, meta: dict | None = None,
                props: dict | None = None) -> int:
        import time

        tmp = os.path.join(self.log, f".tmp-{uuid.uuid4().hex}")
        doc = {"op": op, "actions": actions, "schema": schema, "meta": meta or {},
               "props": props or {}, "ts": time.time()}
        v = expected_version
        try:
            while True:
                doc["version"] = v
                with open(tmp, "w") as f:
                    json.dump(doc, f)
                    f.flush()
                    os.fsync(f.fileno())
                try:
                    os.link(tmp, _version_path(self.log, v))  # atomic exclusive publish
                    break
                except FileExistsError:
                    if op in ("append", "stream_append"):  # blind appends commute
                        v += 1  # blind appends commute: retry on the new head
                    else:
                        raise ConcurrentWriteError(
                            f"{op} at version {v} lost the race; snapshot is stale"
                        )
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)
        if v % self.checkpoint_interval == 0 and v > 0:
            live, schema_now, props_now = self._snapshot_full(v)
            cp_doc = {"version": v, "live": list(live.values()), "schema": schema_now,
                      "props": props_now}
            cp_tmp = tmp + ".cp"
            with open(cp_tmp, "w") as f:
                json.dump(cp_doc, f)
            os.replace(cp_tmp, _version_path(self.log, v, checkpoint=True))
        return v

    # -------------------------------------------------------------- write --

    def _write_files(self, df: DataFrame, cluster_by: Sequence[str] | None,
                     zorder_by: Sequence[str] | None = None,
                     partition_by: Sequence[str] | None = None,
                     bucket_by: dict | None = None) -> list[dict]:
        """Write df as immutable parquet files under a fresh commit dir and
        return their add-actions with per-file stats (one Spark job each).

        ``partition_by`` writes hive-layout identity partitions; each file's
        partition values are parsed from its path into the add-action, so
        reads/pruning never re-list or re-parse directories (the
        Iceberg-manifest approach: partition data lives in table metadata).
        ``bucket_by`` ({"col": c, "n": n}) hash-partitions rows with Spark's
        own HashPartitioning (pmod(murmur3, n)) and records each file's
        bucket id — the part-file index IS the partition id on a
        deterministic one-stage write."""
        commit_dir = os.path.join(self.path, "data", uuid.uuid4().hex)
        out = df
        if zorder_by:
            n = max(df.rdd.getNumPartitions(), 2)
            zk = zorder_key(df, list(zorder_by))
            out = (
                df.withColumn("__zkey__", zk)
                .repartitionByRange(n, F.col("__zkey__"))
                .sortWithinPartitions("__zkey__")
                .drop("__zkey__")
            )
        elif bucket_by:
            out = df.repartition(int(bucket_by["n"]), F.col(bucket_by["col"]))
        elif cluster_by:
            # range-partition so each file covers a tight value range: this
            # is what makes min/max pruning selective. The partition count is
            # pinned explicitly so AQE doesn't coalesce small test inputs
            # into one file (at scale, pick ~table_bytes / 1 GB).
            n = max(df.rdd.getNumPartitions(), 2)
            out = out.repartitionByRange(n, *[F.col(c) for c in cluster_by])
        writer = out.write.mode("error")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(commit_dir)
        # Per-file rows + min/max/null-count come from the parquet FOOTERS on
        # the driver — zero extra Spark jobs per commit (Delta does the same
        # via write-task stats). On an object store this is one ranged GET of
        # each footer, still metadata-scale.
        import pyarrow.parquet as pq
        from urllib.parse import unquote

        files = sorted(
            os.path.join(r, fn)
            for r, _, fns in os.walk(commit_dir)
            for fn in fns
            if fn.endswith(".parquet")
        )
        actions = []
        for fpath in files:
            md = pq.ParquetFile(fpath).metadata
            col_idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
            stats = {}
            for c in self.stats_cols:
                if c not in col_idx:
                    continue
                lo = hi = None
                nulls = 0
                ok = True
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(col_idx[c]).statistics
                    if st is None or not st.has_min_max:
                        ok = False
                        break
                    nulls += st.null_count or 0
                    lo = st.min if lo is None or st.min < lo else lo
                    hi = st.max if hi is None or st.max > hi else hi
                if ok:
                    stats[c] = {"min": _json_safe(lo), "max": _json_safe(hi),
                                "nulls": nulls}
            add = {
                "path": os.path.relpath(fpath, self.path),
                "rows": md.num_rows,
                "bytes": os.path.getsize(fpath),
                "stats": stats,
            }
            if partition_by:
                pv = {}
                rel = os.path.relpath(fpath, commit_dir)
                for seg in rel.split(os.sep)[:-1]:
                    col, _, raw = seg.partition("=")
                    pv[col] = (
                        None if raw == "__HIVE_DEFAULT_PARTITION__"
                        else _coerce_scalar(unquote(raw))
                    )
                add["partition_values"] = pv
            if bucket_by:
                # part-00037-<uuid>.parquet -> partition (= bucket) id 37
                add["bucket"] = int(os.path.basename(fpath).split("-")[1])
                add["bucket_spec"] = {"col": bucket_by["col"], "n": int(bucket_by["n"])}
            actions.append({"add": add})
        return actions

    def _check_schema(self, df: DataFrame, merge_schema: bool) -> None:
        """Delta-style strictness: widening the schema (new columns) needs an
        explicit ``merge_schema=True``; silent drift is an error. Removed
        columns are always rejected (old files can't grow data back)."""
        _, stored = self._snapshot()
        if stored is None:
            return
        old_cols = {f["name"] for f in stored["fields"]}
        new_cols = set(df.columns)
        if old_cols - new_cols:
            raise ValueError(f"schema removes columns {sorted(old_cols - new_cols)}")
        if (new_cols - old_cols) and not merge_schema:
            raise ValueError(
                f"schema adds columns {sorted(new_cols - old_cols)}; "
                "pass merge_schema=True to evolve"
            )

    def append(self, df: DataFrame, cluster_by: Sequence[str] | None = None,
               meta: dict | None = None, zorder_by: Sequence[str] | None = None,
               merge_schema: bool = False,
               partition_by: Sequence[str] | None = None,
               bucket_by: dict | None = None) -> int:
        """Append; ``partition_by``/``bucket_by`` both layout THIS write and
        evolve the table's current spec (recorded in commit props — old files
        keep the spec they were written under, Iceberg-style). Omitting them
        keeps the current spec: an existing partition spec is applied to the
        incoming batch automatically."""
        self._check_schema(df, merge_schema)
        props = {}
        if partition_by is not None:
            props["partition_spec"] = list(partition_by)
        if bucket_by is not None:
            props["bucket_spec"] = {"col": bucket_by["col"], "n": int(bucket_by["n"])}
        cur = self._snapshot_full()[2]
        self._enforce(cur.get("checks", {}), df)
        eff_partition = (
            list(partition_by) if partition_by is not None
            else cur.get("partition_spec", [])
        )
        eff_bucket = bucket_by if bucket_by is not None else cur.get("bucket_spec")
        adds = self._write_files(df, cluster_by, zorder_by,
                                 partition_by=eff_partition or None,
                                 bucket_by=eff_bucket)
        return self._commit("append", adds, self.version() + 1,
                            df.schema.jsonValue(), meta, props or None)

    def overwrite(self, df: DataFrame, cluster_by: Sequence[str] | None = None,
                  meta: dict | None = None,
                  partition_by: Sequence[str] | None = None,
                  bucket_by: dict | None = None) -> int:
        base = self.version()
        live, _, cur = self._snapshot_full(base)
        self._enforce(cur.get("checks", {}), df)
        props = {}
        if partition_by is not None:
            props["partition_spec"] = list(partition_by)
        if bucket_by is not None:
            props["bucket_spec"] = {"col": bucket_by["col"], "n": int(bucket_by["n"])}
        eff_partition = (
            list(partition_by) if partition_by is not None
            else cur.get("partition_spec", [])
        )
        eff_bucket = bucket_by if bucket_by is not None else cur.get("bucket_spec")
        actions = [{"remove": _remove_action(a)} for a in live.values()]
        actions += self._write_files(df, cluster_by,
                                     partition_by=eff_partition or None,
                                     bucket_by=eff_bucket)
        return self._commit("overwrite", actions, base + 1, df.schema.jsonValue(),
                            meta, props or None)

    def merge(self, source: DataFrame, keys: Sequence[str],
              cluster_by: Sequence[str] | None = None,
              prune_col: str | None = None, **merge_kwargs) -> int:
        """Copy-on-write MERGE: run the relational merge (operators/merge.py
        — the engine's S6-S8 semantics) against the target snapshot and
        publish atomically.

        With ``prune_col`` (a stats column), the rewrite is FILE-GRANULAR:
        the batch's [min, max] on that column (one tiny aggregation) selects
        only the target files whose zone maps overlap; untouched files stay
        in the snapshot as-is — the Delta/Iceberg merge-on-read-competitive
        path.  A daily delta against a date-clustered 100 TB table rewrites
        one day's files, not the table.  Rows outside the touched files are
        untouched by construction: their key ranges cannot intersect the
        batch.  Without ``prune_col``, the whole live set rewrites.

        On a bucketed table whose bucket column is one of ``keys``, pruning
        is automatic: the source's distinct bucket ids (pmod(murmur3, n) —
        Spark's own HashPartitioning function, so file bucket ids and the
        computed ids agree by construction) select the touched files; files
        from before the bucket spec (no bucket metadata) are always
        rewritten.  A small delta against a 1000-bucket table rewrites only
        the buckets its keys hash into."""
        from etl_mssql_to_postgres_dailysync_spark.operators.merge import merge as rel_merge

        base = self.version()
        live, _, props = self._snapshot_full(base)
        bspec = props.get("bucket_spec")
        pspec = props.get("partition_spec", [])
        if prune_col is None and bspec and bspec["col"] in keys:
            ids = {
                r[0]
                for r in source.select(
                    F.pmod(F.hash(F.col(bspec["col"])), F.lit(int(bspec["n"])))
                ).distinct().collect()
            }
            touched = {
                p for p, a in live.items()
                if a.get("bucket") is None
                or a.get("bucket_spec") != bspec
                or a["bucket"] in ids
            }
            target = self._read_add_files(
                [live[p] for p in touched], self._snapshot(base)[1]
            )
        elif prune_col is not None:
            lohi = source.agg(
                F.min(F.col(prune_col)).alias("lo"), F.max(F.col(prune_col)).alias("hi")
            ).first()
            touched = {f.path for f in self.files(base, prune=(prune_col,
                       _json_safe(lohi["lo"]), _json_safe(lohi["hi"])))}
            target = self._read_add_files(
                [live[p] for p in touched], self._snapshot(base)[1]
            )
        else:
            touched = set(live.keys())
            target = self.read(version=base)
        merged = rel_merge(target, source, keys, **merge_kwargs).df
        self._enforce(props.get("checks", {}), merged)
        actions = [{"remove": _remove_action(live[p])} for p in touched]
        actions += self._write_files(merged, cluster_by,
                                     partition_by=pspec or None, bucket_by=bspec)
        return self._commit("merge", actions, base + 1, merged.schema.jsonValue(),
                            {"keys": list(keys), "files_rewritten": len(touched),
                             "files_kept": len(live) - len(touched)})

    def delete(self, condition, prune_col: str | None = None) -> int:
        """DELETE rows matching ``condition`` (a Column predicate) — the
        copy-on-write erasure op (GDPR right-to-be-forgotten, bad-batch
        rollback): matching files rewrite WITHOUT the matching rows,
        untouched files stay in the snapshot as-is.

        With ``prune_col`` + a range-expressible condition, pass the bounds
        via ``prune_col=(col, lo, hi)`` style tuples through ``files()``;
        here the simpler contract: if ``prune_col`` is given, only files
        whose zone maps admit rows matching the condition are CANDIDATES for
        rewrite — callers provide the prune bounds by first computing them.
        Without it, candidates are determined by actually testing each
        file's rows (still file-granular: files with zero matches are kept
        by PATH, not rewritten — the rewrite set is exactly the files that
        contain matches).

        Physical erasure completes at vacuum(): like Delta, the old files
        remain for time travel until the retention window passes."""
        base = self.version()
        live, schema, props = self._snapshot_full(base)
        touched = self._files_matching(condition, live, schema)
        if not touched:
            return base  # nothing matches; no commit needed
        # SQL DELETE semantics: remove rows where the condition is TRUE;
        # rows where it is NULL/UNKNOWN are KEPT. A bare ~condition drops
        # them (mixed_null_keys fixture find: a GDPR delete on user_id ==
        # victim silently destroyed the NULL-keyed rows of every rewritten
        # file — and WHICH rows died depended on the file layout, so the
        # corruption was nondeterministic across sessions).
        keep = self._read_add_files([live[p] for p in touched], schema).filter(
            ~F.coalesce(condition, F.lit(False))
        )
        actions = [{"remove": _remove_action(live[p])} for p in touched]
        actions += self._write_files(
            keep, None, partition_by=props.get("partition_spec") or None,
            bucket_by=props.get("bucket_spec"))
        return self._commit("delete", actions, base + 1, schema,
                            {"files_rewritten": len(touched),
                             "files_kept": len(live) - len(touched)})

    def _files_matching(self, condition, live: dict, schema) -> list[str]:
        """Relative paths of live files containing >=1 row matching
        ``condition`` — ONE job (input_file_name per matching row,
        distinct), never a per-file probe loop."""
        from urllib.parse import unquote, urlparse

        full = self._read_add_files(list(live.values()), schema)
        hit_uris = [r[0] for r in full.filter(condition)
                    .select(F.input_file_name()).distinct().collect()]
        hit_paths = {unquote(urlparse(u).path) for u in hit_uris}
        return [p for p in live if os.path.join(self.path, p) in hit_paths]

    def update(self, condition, set: dict) -> int:
        """UPDATE rows matching ``condition``: per column in ``set``, matching
        rows take the new expression, non-matching rows keep their value —
        the copy-on-write sibling of delete(). File-granular like Delta's
        UPDATE: only files containing a match rewrite; the rest of the
        snapshot is untouched metadata.

        ``set`` maps column name -> Column/literal; each result is cast back
        to the column's existing type so the table schema is invariant under
        update (an UPDATE is data motion, never schema motion)."""
        base = self.version()
        live, schema, props = self._snapshot_full(base)
        touched = self._files_matching(condition, live, schema)
        if not touched:
            return base
        df = self._read_add_files([live[p] for p in touched], schema)
        types = dict(df.dtypes)
        unknown = [c for c in set if c not in types]
        if unknown:
            raise ValueError(f"update targets unknown columns: {unknown}")
        updated = df.withColumns({
            c: F.when(condition, F.lit(v) if not isinstance(v, Column) else v)
                .otherwise(F.col(c)).cast(types[c])
            for c, v in set.items()
        })
        self._enforce(props.get("checks", {}), updated)
        actions = [{"remove": _remove_action(live[p])} for p in touched]
        actions += self._write_files(
            updated, None, partition_by=props.get("partition_spec") or None,
            bucket_by=props.get("bucket_spec"))
        return self._commit("update", actions, base + 1, schema,
                            {"set_columns": sorted(set),
                             "files_rewritten": len(touched),
                             "files_kept": len(live) - len(touched)})

    def restore(self, version: int) -> int:
        """RESTORE the table to an earlier snapshot (Delta ``RESTORE TABLE …
        TO VERSION AS OF``): a NEW commit whose actions re-add the target
        version's files and remove the rest — pure metadata, zero data
        rewrite, and itself time-travelable (restoring a restore works).

        Fails if any file of the target snapshot was already vacuumed."""
        base = self.version()
        want, schema, props = self._snapshot_full(version)
        missing = [p for p in want
                   if not os.path.exists(os.path.join(self.path, p))]
        if missing:
            raise ValueError(
                f"cannot restore to v{version}: {len(missing)} file(s) "
                f"vacuumed, e.g. {missing[0]}")
        live, _, _ = self._snapshot_full(base)
        actions = [{"remove": _remove_action(live[p])}
                   for p in live if p not in want]
        actions += [{"add": want[p]} for p in want if p not in live]
        return self._commit(
            "restore", actions, base + 1, schema,
            {"restored_to": version,
             "files_added": sum(1 for p in want if p not in live),
             "files_removed": sum(1 for p in live if p not in want)},
            # explicit reset: the TARGET's layout wins even when the target
            # predates a later spec evolution (absent key would not clear it)
            props={"partition_spec": props.get("partition_spec", []),
                   "bucket_spec": props.get("bucket_spec")})

    def compact(self, num_files: int | None = None, target_mb: int | None = None) -> int:
        """Rewrite the live set into ``num_files`` files (bin-packing OPTIMIZE);
        a normal commit, so time travel before it still works. A partition/
        bucket spec survives compaction (bucketed tables compact per bucket —
        the layout IS the file count).

        ``target_mb`` sizes the output from LOG metadata instead: num_files =
        ceil(live_bytes / target) — the small-file compactor needs no data
        scan to plan itself (the OPTIMIZE file-size heuristic every lakehouse
        runs on manifest stats)."""
        base = self.version()
        live, _, props = self._snapshot_full(base)
        pspec = props.get("partition_spec", [])
        bspec = props.get("bucket_spec")
        if num_files is None:
            if target_mb is not None:
                total = sum(a.get("bytes", 0) for a in live.values())
                num_files = max(1, -(-total // (target_mb * 1024 * 1024)))
            else:
                num_files = 1
        df = self.read()
        if not bspec:
            df = df.coalesce(num_files)
        actions = [{"remove": _remove_action(a)} for a in live.values()]
        actions += self._write_files(df, None, partition_by=pspec or None,
                                     bucket_by=bspec)
        return self._commit("compact", actions, base + 1, df.schema.jsonValue())

    # --------------------------------------------------------------- read --

    def files(self, version: int | None = None,
              prune: tuple | list | None = None) -> list[AddFile]:
        """Live files at ``version``, optionally zone-map-pruned by
        ``(col, lo, hi)`` predicates (lo/hi inclusive, None = unbounded)."""
        live, _ = self._snapshot(version)
        preds = []
        if prune:
            preds = [prune] if isinstance(prune, tuple) else list(prune)
        out = []
        for a in live.values():
            keep = True
            for col, lo, hi in preds:
                pv = a.get("partition_values") or {}
                if col in pv and pv[col] is not None:
                    # identity-partition value: exact containment check
                    v = pv[col]
                    if (hi is not None and str_cmp(v, hi) > 0) or (
                        lo is not None and str_cmp(v, lo) < 0
                    ):
                        keep = False
                        break
                    continue
                st = a.get("stats", {}).get(col)
                if st is None or st["min"] is None:
                    continue  # no stats -> cannot prune, must read
                if (hi is not None and str_cmp(st["min"], hi) > 0) or (
                    lo is not None and str_cmp(st["max"], lo) < 0
                ):
                    keep = False
                    break
            if keep:
                out.append(AddFile(a["path"], a["rows"], a.get("stats", {}),
                                   a.get("partition_values"), a.get("bucket")))
        return out

    def _read_add_files(self, adds: list, schema: dict | None) -> DataFrame:
        """Scan a set of add-actions/AddFiles as one DataFrame.

        Hive-layout files don't store their partition columns in the data;
        re-attach them as literals from LOG metadata (never by re-parsing
        paths at scan time). One scan per distinct partition tuple — a
        spec-evolution read unions the per-spec scans, so each branch still
        gets pushdown/pruning independently."""
        fs = [
            a if isinstance(a, AddFile)
            else AddFile(a["path"], a["rows"], a.get("stats", {}),
                         a.get("partition_values"), a.get("bucket"))
            for a in adds
        ]
        if not fs:
            st = StructType.fromJson(schema) if schema else StructType([])
            return self.spark.createDataFrame([], st)
        groups: dict[tuple, list[AddFile]] = {}
        for f in fs:
            key = tuple(sorted((f.partition_values or {}).items()))
            groups.setdefault(key, []).append(f)
        stype = StructType.fromJson(schema) if schema else None
        parts = []
        for key, members in sorted(groups.items(), key=lambda kv: str(kv[0])):
            df = self.spark.read.option("mergeSchema", "true").parquet(
                *[os.path.join(self.path, m.path) for m in members]
            )
            for col, val in key:
                if col not in df.columns:
                    typ = stype[col].dataType if stype and col in stype.names else None
                    lit = F.lit(val)
                    df = df.withColumn(col, lit.cast(typ) if typ else lit)
            parts.append(df)
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p, allowMissingColumns=True)
        return df

    def read(self, version: int | None = None, prune=None) -> DataFrame:
        _, schema = self._snapshot(version)
        fs = self.files(version, prune)
        df = self._read_add_files(fs, schema)
        # project to the committed schema at this version: columns added by a
        # later schema evolution read as NULL from pre-evolution files, and
        # column ORDER is the logged one, not parquet-footer order
        if schema and fs:
            cols = [f["name"] for f in schema["fields"]]
            df = df.select(*[
                F.col(c) if c in df.columns
                else F.lit(None).cast(
                    StructType.fromJson(schema)[c].dataType
                ).alias(c)
                for c in cols
            ])
        return df

    # ----------------------------------------------------- metadata views --

    def files_df(self, version: int | None = None) -> DataFrame:
        """The live file manifest as a DataFrame (Delta DESCRIBE DETAIL /
        Iceberg ``.files`` analog): operational queries — size skew, bucket
        balance, partition counts, stats coverage — run as ordinary Spark
        over METADATA, never scanning data."""
        rows = [
            (
                f.path,
                f.rows,
                f.bucket,
                json.dumps(f.partition_values) if f.partition_values else None,
                json.dumps(f.stats, sort_keys=True),
            )
            for f in self.files(version)
        ]
        return self.spark.createDataFrame(
            rows, "path string, rows long, bucket int, partition_values string, stats string"
        )

    def history_df(self) -> DataFrame:
        """The commit history as a DataFrame (DESCRIBE HISTORY analog)."""
        rows = [
            (h["version"], h["op"], json.dumps(h["meta"], sort_keys=True))
            for h in self.history()
        ]
        return self.spark.createDataFrame(rows, "version long, op string, meta string")

    # ------------------------------------------------------------- vacuum --

    def vacuum(self, retain_versions: int = 0) -> list[str]:
        """Delete data files unreferenced by every version in
        [head - retain_versions, head].  Destroys time travel before that
        horizon (like Delta VACUUM's retention window)."""
        head = self.version()
        referenced: set[str] = set()
        for v in range(max(0, head - retain_versions), head + 1):
            live, _ = self._snapshot(v)
            referenced.update(live.keys())
        deleted = []
        data_root = os.path.join(self.path, "data")
        for r, _, fns in os.walk(data_root):
            for fn in fns:
                if not fn.endswith(".parquet"):
                    continue
                f = os.path.join(r, fn)
                rel = os.path.relpath(f, self.path)
                if rel not in referenced:
                    os.unlink(f)
                    deleted.append(rel)
        # drop now-empty commit/partition dirs bottom-up
        for r, dirs, fns in os.walk(data_root, topdown=False):
            if r != data_root and not os.listdir(r):
                shutil.rmtree(r)
        return deleted


def _remove_action(add: dict) -> dict:
    """Remove-actions echo the file's layout metadata so downstream CDC
    readers can reconstruct hive-partition columns for retracted rows."""
    out = {"path": add["path"]}
    if add.get("partition_values") is not None:
        out["partition_values"] = add["partition_values"]
    if add.get("bucket") is not None:
        out["bucket"] = add["bucket"]
    return out


def _coerce_scalar(raw: str):
    """Partition values parsed from a hive path are strings; store ints/
    floats natively so pruning compares numerically, not lexically."""
    try:
        return int(raw)
    except ValueError:
        try:
            return float(raw)
        except ValueError:
            return raw


def _json_safe(v):
    """Stats values must survive a JSON round trip; order-comparable form."""
    if v is None or isinstance(v, (int, float, bool)):
        return v
    return str(v)


def str_cmp(a, b) -> int:
    """Compare two stats values; JSON round-trips timestamps to ISO strings,
    which order the same lexically as temporally."""
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        return (a > b) - (a < b)
    a, b = str(a), str(b)
    return (a > b) - (a < b)


def table_changes(table: TxnTable, v_from: int, v_to: int,
                  keys: Sequence[str], include_preimage: bool = False) -> DataFrame:
    """CDC between two snapshots: row-level insert/update/delete changeset.

    The reference explicitly scopes CDC out (README.md:78, "UpdatedDateUtc
    changes missed"; dags/…_orders_daily.py:33-36) — its daily partition
    re-extract misses in-place updates.  With a transactional table the
    changeset is derivable from any two versions: one full-outer join on the
    key, structs compared null-safely.  Updates emit the post-image, plus the
    pre-image as a separate ``update_preimage`` row when
    ``include_preimage=True`` (the Delta CDF contract — what incremental
    view maintenance needs to retract old contributions); at scale the join is key-
    partitioned and version snapshots share unchanged files, so only
    rewritten files actually differ in content.
    """
    a, b = table.read(version=v_from), table.read(version=v_to)
    cols = b.columns
    non_keys = [c for c in cols if c not in keys]
    pa = a.select(*keys, F.struct(*non_keys).alias("__a__"))
    pb = b.select(*keys, F.struct(*non_keys).alias("__b__"))
    j = pa.join(pb, list(keys), "full_outer")
    change = (
        F.when(F.col("__a__").isNull(), F.lit("insert"))
        .when(F.col("__b__").isNull(), F.lit("delete"))
        .when(~F.col("__a__").eqNullSafe(F.col("__b__")), F.lit("update_postimage"))
    )
    picked = F.coalesce(F.col("__b__"), F.col("__a__"))
    out = (
        j.withColumn("_change_type", change)
        .filter(F.col("_change_type").isNotNull())
        .select(*keys, *[picked[c].alias(c) for c in non_keys], "_change_type")
    )
    if include_preimage:
        pre = (
            j.filter(
                F.col("__a__").isNotNull()
                & F.col("__b__").isNotNull()
                & ~F.col("__a__").eqNullSafe(F.col("__b__"))
            )
            .select(
                *keys,
                *[F.col("__a__")[c].alias(c) for c in non_keys],
                F.lit("update_preimage").alias("_change_type"),
            )
        )
        out = out.unionByName(pre)
    return out


def zorder_key(df: DataFrame, cols: Sequence[str], bits: int = 16):
    """Morton (Z-order) key over numeric columns: each value is min-max
    scaled to ``bits`` bits (one tiny stats aggregation), then bit-planes
    are interleaved — points close in EVERY dimension get close keys, so
    range-clustering the write by this key keeps per-file min/max tight on
    ALL the z-ordered columns at once.  Linear cluster_by gives perfect
    pruning on one column and none on the others; Z-order trades a little
    of the first for usable pruning on each (the standard lakehouse
    OPTIMIZE ZORDER BY design).  Returns (column_expr, stats_row)."""
    aggs = []
    for c in cols:
        aggs += [F.min(F.col(c).cast("double")).alias(f"__lo_{c}"),
                 F.max(F.col(c).cast("double")).alias(f"__hi_{c}")]
    st = df.agg(*aggs).first()
    planes = []
    top = (1 << bits) - 1
    for i, c in enumerate(cols):
        lo, hi = st[f"__lo_{c}"], st[f"__hi_{c}"]
        span = (hi - lo) or 1.0
        scaled = F.least(
            F.lit(top),
            ((F.col(c).cast("double") - F.lit(lo)) * top / F.lit(span)).cast("long"),
        )
        for b in range(bits):
            planes.append(
                F.shiftleft(F.shiftright(scaled, b).bitwiseAND(F.lit(1)), b * len(cols) + i)
            )
    key = planes[0]
    for p in planes[1:]:
        key = key + p
    return key
