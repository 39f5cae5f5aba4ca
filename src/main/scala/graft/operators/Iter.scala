package graft.operators

import org.apache.spark.sql.DataFrame

/** Round-pinning for the fixed-round iterative operators (PageRank, BFS,
  * k-core, label propagation, pointer jumping).
  *
  * Every round of those loops ends in a `localCheckpoint` so the Catalyst
  * plan stays O(1) in the iteration count (the q74 lesson). The checkpoint
  * used to be EAGER, which also made every round a separate driver action:
  * an 8-round PageRank paid 8 sequential job round trips before the query's
  * own action ran — pure driver latency, ~0.15–0.3 s per round on the r20
  * box, invisible at cluster scale per-job but multiplied by every
  * iterative query in the bench (guide §5: the driver should do almost no
  * work; §2.6: actions are sequential only because the driver calls them
  * sequentially).
  *
  * [[pin]] keeps the plan truncation (the returned frame is LogicalRDD
  * either way) but defers materialization (`eager = false`): all rounds
  * execute as chained stages inside the ONE action that consumes the final
  * round. Each checkpointed RDD still computes exactly once and is stored
  * (compute-once is what the determinism pins rely on — lazy checkpoints
  * keep that contract; only the TIMING of the single materialization
  * moves). `SPARK_GRAFT_ITER=eager` re-forces the old per-round
  * materialization for A/B re-measurement (the SPARK_GRAFT_GAPS
  * convention); results are bit-identical either way — the iterative
  * queries' oracles (q113/q157/q74/q134/q141/q181) hash every round's
  * arithmetic.
  */
object Iter {
  def pin(df: DataFrame): DataFrame =
    df.localCheckpoint(eager = sys.env.get("SPARK_GRAFT_ITER").contains("eager"))
}
