package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.SnapshotTable

/** Seeded differential fuzz over the two read paths: random tables
  * take random sequences of appends, dv deletes, and equality deletes
  * (long- and string-keyed), then the V2 connector read (vectorized
  * masking inside the batches) must return the exact multiset the
  * programmatic `SnapshotTable.scan` (broadcast anti-join masking)
  * returns — on the full row, and on a projection that omits the key
  * columns (exercising the reader's appended-column mask path). The
  * two implementations share no masking code, so agreement is real
  * evidence. */
class MaskedReadFuzzSpec extends SparkTestBase {
  import spark.implicits._

  private def freshDir(): String =
    Files.createTempDirectory("graft-fuzzmask").toString

  test("connector read == programmatic scan under random dv+eq masking") {
    val rnd = new scala.util.Random(20260816L)
    for (round <- 1 to 6) {
      val dir = freshDir()
      val n = 2000 + rnd.nextInt(3000)
      val mod = 37 + rnd.nextInt(300)
      def gen(lo: Long, hi: Long) = spark.range(lo, hi).select(
        (($"id" * 2654435761L) % n).as("k"),
        concat(lit("u"), (($"id" * 7) % mod).cast("string")).as("s"),
        ($"id" * 3).as("v"))
      val base = rnd.nextInt(3) match {
        case 0 => gen(0, n).repartitionByRange(4, $"k") // clustered
        case 1 => gen(0, n).repartition(4) // scrambled
        case _ => gen(0, n).coalesce(1) // single file
      }
      SnapshotTable.write(spark, base, dir, "overwrite", Seq("k", "s"),
        bloomCols = if (rnd.nextBoolean()) Seq("s") else Nil)
      var appended = 0L
      for (_ <- 1 to 3) rnd.nextInt(4) match {
        case 0 =>
          SnapshotTable.deleteVectors(spark, dir,
            $"v" % (5 + rnd.nextInt(20)) === rnd.nextInt(5))
        case 1 =>
          val lo = rnd.nextInt(n)
          SnapshotTable.deleteByKey(spark, dir, "k",
            spark.range(lo, lo + 1 + rnd.nextInt(200)).toDF("k"))
        case 2 =>
          val picks = Seq.fill(1 + rnd.nextInt(8))(
            s"u${rnd.nextInt(mod + 5)}") // some keys absent on purpose
          SnapshotTable.deleteByKey(spark, dir, "s", picks.toDF("s"))
        case _ =>
          val lo = n + appended
          SnapshotTable.write(spark, gen(lo, lo + 100 + rnd.nextInt(300)),
            dir, "append", Seq("k", "s"))
          appended += 400 // upper bound; exact count irrelevant
      }
      def multiset(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
      val v2 = spark.read.format("graft_snapshot").load(dir)
      val prog = SnapshotTable.scan(spark, dir)
      assert(multiset(v2.select($"k", $"s", $"v")) ==
        multiset(prog.select($"k", $"s", $"v")),
        s"round $round: full-row multisets diverged")
      // a projection WITHOUT the key columns forces the columnar
      // reader to append k and s for the mask and strip them
      assert(multiset(v2.select($"v")) == multiset(prog.select($"v")),
        s"round $round: keyless projection diverged")
      assert(v2.count() == prog.count(), s"round $round: counts diverged")
    }
  }
}
