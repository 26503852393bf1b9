"""Engine configuration.

The reference drives everything from ``driverconfig.json``
(``pagerank_lambda/dynamodb/driverconfig.json:1-19``: bucket, partition width
``divided_page_num: 1000``, fan-out ``invoked_lambda_num: 4840``, Lambda
sizing). Here the analogous knobs are a dataclass + SparkSession confs; the
physical fan-out count is ``spark.sql.shuffle.partitions``.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class EngineConfig:
    """Tunables for the link-graph engine.

    Scale notes (100 TB / 10^12-turn target):

    - ``shuffle_partitions`` should be sized so each shuffle partition of the
      edge table fits in executor memory (~128 MiB of shuffle data each); on a
      1000-executor cluster that is O(100k) partitions, locally 32.
    - ``hub_degree_threshold``: vertices whose degree exceeds this are
      "hubs"; their rank rows are broadcast and their edges joined map-side
      (no shuffle of the heavy keys). The shuffled remainder is additionally
      covered by AQE skew-join splitting.
    - ``block_width``: dst-id range width of one CSR adjacency block —
      the Spark analogue of the reference's ``divided_page_num: 1000``
      range partitioning (``init_to_s3.py:57,65-69``).
    """

    # --- PageRank semantics -------------------------------------------------
    damping: float = 0.85  # textbook default; compat mode uses 0.8
    tol: float = 1e-6  # L-inf residual convergence target
    max_iterations: int = 100

    # --- physical -----------------------------------------------------------
    shuffle_partitions: int = 32
    hub_degree_threshold: int = 1000
    salt_buckets: int = 8
    block_width: int = 1000  # reference: divided_page_num=1000

    # --- checkpointing ------------------------------------------------------
    checkpoint_every: int = 1  # supersteps between durable checkpoints
    checkpoint_path: str | None = None

    # --- spark conf overlay -------------------------------------------------
    extra_conf: dict = field(default_factory=dict)


#: Reference-compatibility semantics: damping 0.8, fixed 3 iterations,
#: divisor = contributor's stored in-degree-or-1, no dangling-mass term,
#: init rank = 1/N, remain = (1-d)/N computed once.
#: (pagerank.py:67,80,85-88; driver.py:113,157-159,127-135)
COMPAT_DAMPING = 0.8
COMPAT_ITERATIONS = 3
