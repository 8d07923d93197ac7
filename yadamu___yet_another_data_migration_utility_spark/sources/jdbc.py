"""JDBC snapshot source: partitioned parallel read -> LakeTable seed.

The reference's reason to exist is reading live RDBMSs; its two reader
strategies are a streaming cursor
(/root/reference/src/YADAMU/postgres/node/postgresDBI.js:575-598,
pg-query-stream) and a partitioned parallel read that splits a table
into N worker ranges
(/root/reference/src/YADAMU/oracle/node/oracleDBI.js:1256-1267).

Spark-first re-expression: ``spark.read.jdbc`` with
partitionColumn/lowerBound/upperBound/numPartitions IS the partitioned
parallel read -- every executor opens its own cursor for its range, so
the snapshot scales with the fleet instead of a single pipe. The seed
then lands through ``LakeTable.append`` (the bulk path), after which
the CDC tail takes over.

Sandbox honesty: no database server exists in this container, so this
module is exercised at the interface level (option construction,
bounds-discovery SQL, plan shape); the one network call is isolated in
``read_snapshot``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class JdbcSnapshotConfig:
    """Connection + partitioning spec for one table snapshot."""

    url: str  # jdbc:postgresql://host/db etc.
    table: str  # table name or "(subquery) t"
    partition_column: str | None = None  # numeric/date/timestamp column
    lower_bound: int | str | None = None
    upper_bound: int | str | None = None
    num_partitions: int = 8
    fetch_size: int = 10_000  # cursor page size (reference BATCH_SIZE=10k,
    # /root/reference/src/YADAMU/common/dbiConstants.js:14)
    properties: dict[str, str] = field(default_factory=dict)  # user/password/driver

    def bounds_query(self) -> str:
        """SQL that discovers partition bounds when not given -- run it
        via the same connection, feed the result back into bounds."""
        if not self.partition_column:
            raise ValueError("bounds_query needs partition_column")
        c = self.partition_column
        return f"SELECT MIN({c}) AS lo, MAX({c}) AS hi FROM {self.table}"

    def reader_options(self) -> dict[str, str]:
        """The exact option dict handed to ``spark.read.format('jdbc')``
        -- split out so tests can assert it without a database."""
        opts: dict[str, str] = {
            "url": self.url,
            "dbtable": self.table,
            "fetchsize": str(self.fetch_size),
        }
        if self.partition_column is not None:
            if self.lower_bound is None or self.upper_bound is None:
                raise ValueError(
                    "partitioned read needs lower_bound/upper_bound "
                    "(use bounds_query() to discover them)"
                )
            opts.update(
                partitionColumn=self.partition_column,
                lowerBound=str(self.lower_bound),
                upperBound=str(self.upper_bound),
                numPartitions=str(self.num_partitions),
            )
        opts.update(self.properties)
        return opts


def read_snapshot(spark: SparkSession, cfg: JdbcSnapshotConfig) -> DataFrame:
    """Open the partitioned JDBC read (the one line that talks to a
    real database)."""
    return spark.read.format("jdbc").options(**cfg.reader_options()).load()


def seed_table(spark: SparkSession, cfg: JdbcSnapshotConfig, table, batch_id: int = 0) -> int:
    """Snapshot ``cfg`` into a LakeTable via the bulk append path; the
    CDC changelog replays on top (lsn 0 seed rows lose to any event)."""
    return table.append(spark, read_snapshot(spark, cfg), batch_id=batch_id)
