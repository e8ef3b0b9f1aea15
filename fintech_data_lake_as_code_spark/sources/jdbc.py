"""JDBC source — the reference's A1 ingest path in its literal form.

The reference full-loads the Aurora MySQL `customeractivity` table through
DMS into the lake (lib/fin-transactions-stack.ts:160-166; table DDL
resources/data/setupTables.py:49-59). The Spark-native equivalent is
`spark.read.format("jdbc")` with a partitioned read: N concurrent range
queries against the OLTP source, exactly DMS's parallel full-load shape.

This module round-trips the reference's insert workload (sources/datagen)
through Apache Derby — the embedded JDBC database that ships inside every
Spark distribution — so the JDBC code path is exercised end-to-end with no
external server. Derby embedded is single-JVM, which is fine on local[n];
a real deployment points the SAME options at MySQL/Postgres (swap url +
driver) where executors connect independently and the partitioned read
genuinely parallelizes across the cluster.

Scale notes (100 TB / real OLTP source):
- `partitionColumn/lowerBound/upperBound/numPartitions` splits the scan
  into range predicates evaluated server-side; without it the whole table
  streams through one task.
- Filters on the Spark side compile into the pushed-down JDBC `WHERE`
  (PushedFilters in the plan), so the database does the selection.
- String columns are created VARCHAR via `createTableColumnTypes` — the
  Derby dialect's CLOB default cannot be compared in pushed-down
  predicates.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import exact_sum
from ..io import module_fingerprint, pid_scratch_dir, seeded_landing
from ..registry import query
from . import datagen as _datagen_module
from .datagen import CUSTOMERACTIVITY_ORACLE, N_ROWS, customeractivity

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"
JDBC_TABLE = "customeractivity"
N_READ_PARTITIONS = 4


def _sweep_derby_scratch(base: str) -> None:
    """One-time reclamation of pre-r19 debris plus dead peers' lock
    files (ADVICE r19 #1). Before the per-process move the SHARED
    database lived directly under `base` (`oltp_db/`, its `_SEED`
    marker, and the landing lock's `<base>.lock` sibling);
    `pid_scratch_dir`'s sweep only reclaims `pid<N>` entries, so that
    layout was stranded forever on every machine that ran pre-r19. No
    live process reads it — every current process boots its own
    `pid<N>/` database and the seed is rebuildable by design — so the
    sweep is unconditionally safe. Dead peers' landing locks
    (`pid<N>.lock`, skipped by `pid_scratch_dir`'s sweep because
    `int("<N>.lock")` raises) are reclaimed with the same kill-0 probe
    that guards the pid dirs; a LIVE peer's lock file is never
    unlinked — that would hand a later opener a fresh inode, i.e. two
    holders of "the" lock."""
    import re
    import shutil

    shutil.rmtree(os.path.join(base, "oltp_db"), ignore_errors=True)
    for stray in (os.path.join(base, "_SEED"), base.rstrip(os.sep) + ".lock"):
        try:
            os.unlink(stray)
        except OSError:
            pass
    try:
        entries = os.listdir(base)
    except OSError:
        return
    for entry in entries:
        m = re.fullmatch(r"pid(\d+)\.lock", entry)
        if not m or int(m.group(1)) == os.getpid():
            continue
        try:
            os.kill(int(m.group(1)), 0)  # signal 0: existence probe
        except ProcessLookupError:
            try:
                os.unlink(os.path.join(base, entry))
            except OSError:
                pass  # raced with a peer's sweep — already gone
        except PermissionError:
            pass  # alive under another uid — a live peer, leave it


def _derby_root(sf_dir: str) -> str:
    """PER-PROCESS Derby root (r19 live-race find): embedded Derby is
    single-JVM by design — the booting JVM holds `db.lck` for its
    lifetime, so a SHARED database path let the first session to run
    `scan_jdbc` brick every concurrent peer's read with "Failed to
    start database" (reproduced: two cold driver-style sessions racing
    the same keys — landing_lock serialized the SEED fine, but the
    post-seed reads still needed the same embedded boot). Each process
    seeds its own database instead: the seed is generator-derived and
    deterministic, so per-process copies are semantically identical,
    and `clear=False` keeps the marker-guarded seed reusable across
    reruns WITHIN the process while dead peers' copies are swept."""
    root = pid_scratch_dir(sf_dir, "derby", clear=False)
    _sweep_derby_scratch(os.path.dirname(root))
    return root


def _derby_url(sf_dir: str) -> str:
    db_path = os.path.join(_derby_root(sf_dir), "oltp_db")
    return f"jdbc:derby:{db_path};create=true"


def _datagen_fingerprint() -> str | None:
    """Identity of the seeded workload: row count + a hash of the
    generator module's source. A pre-existing Derby seed is only trusted
    while this matches what the marker recorded — a datagen change would
    otherwise serve STALE rows against the freshly recomputed oracle
    (the bucketed-layout marker lesson, applied here).

    None when the generator's source is unreadable (bytecode-only
    install, zipimport): the caller treats None as "unverifiable —
    always reseed, record no marker". Paying a reseed per session beats
    either failing the query or trusting a seed whose provenance can't
    be checked."""
    digest = module_fingerprint(_datagen_module)
    return None if digest is None else f"{N_ROWS}:{digest}"


def _derby_committed(spark: SparkSession, db_dir: str) -> bool:
    """Completion predicate for the Derby seed (ADVICE r19 #2).

    Bare `os.path.isdir` trusted any directory with the right name —
    but `clear=False` + PID reuse can hand a new process a dead peer's
    database, and a JVM crash mid-seed can leave a directory that
    exists yet cannot boot (torn service.properties, stale exclusive
    lock state). Existence-trust surfaced those as a confusing
    read-time "Failed to start database" instead of the reseed that
    actually fixes them. So attempt a trivial embedded boot (open +
    close one connection, no `create`): bootable means committed;
    unbootable is cleared on the spot so the reseed's `create=true`
    starts from nothing. The rows are generator-derived and
    deterministic, so clearing can never lose anything a reseed won't
    reproduce byte-for-byte. Classic deployments only (`spark._jvm`),
    same as the rest of this embedded-Derby harness — a real cluster
    points the same reader options at MySQL/Postgres and never takes
    this path."""
    if not os.path.isdir(db_dir):
        return False
    try:
        jvm = spark._jvm  # type: ignore[attr-defined]
        jvm.java.lang.Class.forName(DERBY_DRIVER)
        conn = jvm.java.sql.DriverManager.getConnection(f"jdbc:derby:{db_dir}")
        conn.close()
        return True
    except Exception:
        import shutil

        shutil.rmtree(db_dir, ignore_errors=True)
        return False


def _jdbc_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Load `customeractivity` over JDBC, seeding the Derby database once
    per (scale dir, PROCESS) — see `_derby_root` for why the database
    cannot be shared across sessions (the write is the "OLTP system
    exists" precondition, not part of the query). The seed rides
    `io.seeded_landing` — the ONE marker-guard implementation — with a
    Derby-specific completion predicate (the database directory exists;
    JDBC has no `_SUCCESS` job-commit convention, and the `_SEED` marker
    itself is only written after a successful save). Hand-rolling the
    guard here is what let the r13 marker-atomicity fix land everywhere
    but this file."""
    url = _derby_url(sf_dir)
    derby_root = _derby_root(sf_dir)
    db_dir = os.path.join(derby_root, "oltp_db")

    def _seed() -> None:
        src = customeractivity(spark).select(
            "row_id",
            "user_id",
            "city",
            "transaction_type",
            "monetary_value",
            "timeinapp",
            "feature_used",
            F.unix_timestamp("ts").alias("ts_epoch"),
        )
        (
            src.coalesce(4)
            .write.format("jdbc")
            .option("url", url)
            .option("driver", DERBY_DRIVER)
            .option("dbtable", JDBC_TABLE)
            .option(
                "createTableColumnTypes",
                "city VARCHAR(8), transaction_type VARCHAR(16),"
                " feature_used VARCHAR(32)",
            )
            .mode("overwrite")
            .save()
        )

    seeded_landing(
        derby_root,
        _datagen_fingerprint(),
        _seed,
        committed=lambda: _derby_committed(spark, db_dir),
    )
    return (
        spark.read.format("jdbc")
        .option("url", url)
        .option("driver", DERBY_DRIVER)
        .option("dbtable", JDBC_TABLE)
        .option("partitionColumn", "row_id")
        .option("lowerBound", "0")
        .option("upperBound", str(N_ROWS))
        .option("numPartitions", str(N_READ_PARTITIONS))
        .load()
    )


@query(
    "scan_jdbc",
    oracle=f"""
    SELECT city,
           COUNT(*) AS n_txn,
           CAST(SUM(CAST(ROUND(monetary_value * 100, 0) AS BIGINT)) AS DOUBLE)
             / 100 AS sum_value
    FROM ({CUSTOMERACTIVITY_ORACLE})
    WHERE transaction_type = 'CREDIT'
    GROUP BY city
    """,
)
def scan_jdbc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 literal form: partitioned JDBC full-load of the OLTP table
    (lib/fin-transactions-stack.ts:160-166), predicate pushed into the
    database, then the usual lake-side aggregate. The oracle recomputes the
    same workload from the seeded generator, proving the JDBC write+read
    round-trip is lossless."""
    df = _jdbc_snapshot(spark, sf_dir)
    return (
        df.where(F.col("transaction_type") == "CREDIT")
        .groupBy("city")
        .agg(
            F.count("*").alias("n_txn"),
            exact_sum(F.col("monetary_value")).alias("sum_value"),
        )
    )
