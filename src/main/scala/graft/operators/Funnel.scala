package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered funnel analysis over an event stream: how far did each
  * entity progress through a required sequence of event types, where
  * each stage must occur strictly after the earliest completion of the
  * previous stage.
  *
  * Reference analogue: none — engine-completeness operator; the
  * events table exists exactly for this family of sequence analytics.
  *
  * Scale shape: one hash partition by the entity key serves every
  * stage — stage timestamps are conditional `min` windows over the
  * same partitioning (one per projection step, so no nested window
  * expressions), and Spark plans a single exchange followed by chained
  * Window evaluations (no per-stage self-joins, no driver loop).
  * Output is one row per entity, collapsed from the per-event rows by
  * a groupBy on the already-co-located key.
  */
object Funnel {

  /** Per-entity funnel: `ts_<stage>` for each stage in `stages` (null
    * once the chain breaks) and `funnel_stage` = number of completed
    * stages. Stage i counts only if some event of that type happens
    * strictly after the entity's stage-(i-1) timestamp. */
  def funnelStages(df: DataFrame, entityCol: String, tsCol: String,
      typeCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnelStages requires at least one stage")
    require(stages.distinct.size == stages.size, s"duplicate stages: $stages")
    val byEntity = Window.partitionBy(entityCol)
    val seeded = df.select(col(entityCol), col(tsCol), col(typeCol))
    val withTs = stages.zipWithIndex.foldLeft(seeded) {
      case (cur, (stage, i)) =>
        val gate =
          if (i == 0) col(typeCol) === stage
          else col(typeCol) === stage && col(tsCol) > col(s"ts_${stages(i - 1)}")
        cur.withColumn(s"ts_$stage", min(when(gate, col(tsCol))).over(byEntity))
    }
    val stageCols = stages.map(s => col(s"ts_$s"))
    withTs
      .groupBy(entityCol)
      .agg(first(stageCols.head).as(s"ts_${stages.head}"),
        stageCols.tail.zipWithIndex.map { case (c, i) =>
          first(c).as(s"ts_${stages(i + 1)}")
        }: _*)
      .withColumn("funnel_stage",
        stageCols.map(c => when(c.isNotNull, 1).otherwise(0))
          .reduce(_ + _).cast("int"))
  }
}
