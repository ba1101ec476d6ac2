package graft

import org.apache.spark.sql.DataFrame

/** Checkpoint-mode switch for the iterative operators (q46 chain
  * resolution, d26/d34 connected components, p66 BPE learning, s38 MMR,
  * q58's eager bloom materialization, st47's drained grid).
  *
  * `localCheckpoint()` truncates lineage by materializing partitions into
  * executor BLOCK STORAGE — memory/disk local to the executor. That is
  * the right default for a single-JVM run (zero I/O round-trip), but at
  * cluster scale it is NOT fault-tolerant: losing one executor discards
  * its blocks and kills a multi-hour job mid-iteration, because the
  * truncated lineage cannot recompute them.
  *
  * Setting [[Checkpoints.DirConf]] (`spark.graft.checkpoint.dir`) to a
  * reliable filesystem path (HDFS/S3 on a cluster) switches every call
  * site to reliable `checkpoint()`: one distributed-FS write per
  * materialization buys recomputability across executor loss. Both forms
  * are EAGER and both preserve the child plan's output partitioning and
  * ordering (Dataset.checkpoint wraps the RDD in a LogicalRDD carrying
  * the physical plan's partitioning/ordering), so downstream
  * exchange-reuse shapes are identical in either mode.
  */
object Checkpoints {
  /** Session conf key: when set (non-empty), iterative operators use
    * reliable `checkpoint()` into this directory instead of
    * `localCheckpoint()`. */
  val DirConf = "spark.graft.checkpoint.dir"

  private def reliableDir(df: DataFrame): Option[String] =
    df.sparkSession.conf.getOption(DirConf).filter(_.nonEmpty)

  /** Eagerly materialize `df` and truncate its lineage, in the mode the
    * session conf selects. */
  def of(df: DataFrame): DataFrame = reliableDir(df) match {
    case Some(dir) =>
      val sc = df.sparkSession.sparkContext
      // setCheckpointDir creates a unique subdirectory per context; only
      // (re)set it when unset or pointed elsewhere so repeated calls in
      // one session reuse the same location.
      if (!sc.getCheckpointDir.exists(_.contains(dir)))
        sc.setCheckpointDir(dir)
      df.checkpoint()
    case None => df.localCheckpoint()
  }

  /** Chainable form: `df.graftCheckpoint()` ≡ `Checkpoints.of(df)`. */
  implicit class Ops(private val df: DataFrame) extends AnyVal {
    def graftCheckpoint(): DataFrame = of(df)
  }
}
