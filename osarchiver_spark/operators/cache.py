"""Release discipline for multi-consumer intermediates.

``DataFrame.persist()`` pins an entry in Spark's cache manager until
an explicit ``unpersist()``/``clearCache()`` — fine inside a trainer
loop that releases per-iteration (operators/lr.py, boost.py), but an
operator that RETURNS a DataFrame depending on a persisted
intermediate cannot unpersist before the caller materializes, so
registry-wide runs would accumulate cached relations forever.

``transient()`` is the contract for that shape: materialize once into
executor-local storage with ``localCheckpoint`` (same multi-consumer
reuse as persist, plus lineage truncation) and let Spark's
ContextCleaner free the blocks when the checkpointed RDD is no longer
referenced — i.e. automatically, once the caller drops the returned
DataFrame. No caller-side release call is needed.

Scale caveat (same as every ``localCheckpoint`` in this repo, e.g.
the connected-components loop in operators/dedup.py): blocks are
non-replicated, so an executor loss forfeits the work and the job
must be rerun — at genuine 100 TB scale swap in a reliable
``checkpoint()`` directory. The plans are identical either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def transient(df: DataFrame, eager: bool = False) -> DataFrame:
    """Executor-cached, auto-released twin of ``df.persist()`` for
    DataFrames that outlive the operator that built them."""
    return df.localCheckpoint(eager=eager)
