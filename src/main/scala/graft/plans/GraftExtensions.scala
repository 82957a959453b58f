package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions.cat.GraftExpr.{CosineFFCall, LshBucketsCall, Minhash32Call, ShingleHashesCall, StringKernelCall}
import graft.functions.cat.KmvDistinct

/** Engine extension surface, installed with
  * `spark.sql.extensions=graft.plans.GraftExtensions` (the harness
  * sessions do): exposes every custom kernel expression to SQL as
  * `graft_*` functions and registers [[CollapseIdempotentNormalize]],
  * an optimizer rule that removes re-normalization of already-normal
  * values — the pattern that arises when cleaned per-source frames flow
  * into the unifier's J2 canonicalization pass.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private val SqlFunctions: Seq[(String, String)] = Seq(
    "graft_key_norm" -> "keyNorm",
    "graft_tight_key_norm" -> "tightKeyNorm",
    "graft_flight_norm" -> "flightNorm",
    "graft_flight_valid" -> "flightValid",
    "graft_time_hhmm" -> "timeHhmm",
    "graft_date_yyyy_slash" -> "dateYyyySlash",
    "graft_duration_minutes" -> "durationMinutes",
    "graft_luggage_value" -> "luggageValue",
    "graft_luggage_unit" -> "luggageUnit",
    "graft_luggage_recompose" -> "luggageRecompose",
    "graft_airline_code" -> "airlineCode",
    "graft_head_token" -> "headToken",
    "graft_date_key_mmdd" -> "dateKeyMmDd",
    "graft_simhash60" -> "simhash60")

  /** Foldable int argument of a SQL call (e.g. the k in
    * `graft_minhash32(text, 5)`). */
  private def intArg(e: Expression, sqlName: String): Int = {
    require(e.foldable, s"$sqlName expects a literal int argument")
    e.eval().asInstanceOf[Number].intValue()
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    SqlFunctions.foreach { case (sqlName, kernel) =>
      val info = new ExpressionInfo(classOf[StringKernelCall].getName, sqlName)
      val builder = (args: Seq[Expression]) => {
        require(args.length == 1, s"$sqlName expects exactly one argument")
        StringKernelCall(args.head, kernel)
      }
      ext.injectFunction((FunctionIdentifier(sqlName), info, builder))
    }
    val parameterized: Seq[(String, Seq[Expression] => Expression)] = Seq(
      "graft_shingle_hashes" -> { args =>
        require(args.length == 2, "graft_shingle_hashes(text, k)")
        ShingleHashesCall(args.head, intArg(args(1), "graft_shingle_hashes"))
      },
      "graft_minhash32" -> { args =>
        require(args.length == 2, "graft_minhash32(text, k)")
        Minhash32Call(args.head, intArg(args(1), "graft_minhash32"))
      },
      "graft_lsh_buckets" -> { args =>
        require(args.length == 3, "graft_lsh_buckets(vec, tables, bits)")
        LshBucketsCall(args.head, intArg(args(1), "graft_lsh_buckets"),
          intArg(args(2), "graft_lsh_buckets"))
      },
      "graft_cosine" -> { args =>
        require(args.length == 2, "graft_cosine(a, b)")
        CosineFFCall(args.head, args(1))
      },
      // aggregate: the analyzer wraps a bare AggregateFunction
      "graft_kmv_distinct" -> { args =>
        require(args.length == 2, "graft_kmv_distinct(x, k)")
        KmvDistinct(args.head, intArg(args(1), "graft_kmv_distinct"))
      })
    parameterized.foreach { case (sqlName, builder) =>
      val info = new ExpressionInfo(classOf[GraftExtensions].getName, sqlName)
      ext.injectFunction((FunctionIdentifier(sqlName), info, builder))
    }
    ext.injectOptimizerRule(_ => CollapseIdempotentNormalize)
    // SQL UPDATE / MERGE INTO for snapshot-catalog tables, lowered onto
    // the deletion-vector row-level ops (fires before CheckAnalysis
    // would reject the commands for a non-SupportsRowLevelOperations
    // table).
    ext.injectPostHocResolutionRule(s => SnapshotRowLevelSql(s))
    // SQL ANALYZE TABLE ... COMPUTE STATISTICS [FOR COLUMNS] for
    // snapshot-catalog tables (Spark's planner rejects v2 tables;
    // this lowers onto the manifest stats / NDV-sketch plumbing).
    ext.injectPostHocResolutionRule(s => GraftAnalyzeSql(s))
  }
}

/** `f(f(x)) -> f(x)` for the idempotent kernels, plus the keyNorm /
  * tightKeyNorm absorption laws (tight = strip-all-ws after keyNorm, and
  * both are stable on their own output). The fuzz spec proves the
  * algebra; this rule applies it so pipelines composed of pre-cleaned
  * stages don't pay the normalization twice.
  */
object CollapseIdempotentNormalize extends Rule[LogicalPlan] {

  private val Idempotent = Set(
    "keyNorm", "tightKeyNorm", "flightNorm", "timeHhmm",
    "airlineCode", "luggageUnit")

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // f(f(x)) = f(x)
      case StringKernelCall(inner @ StringKernelCall(_, f2), f1)
          if f1 == f2 && Idempotent(f1) => inner
      // keyNorm(tightKeyNorm(x)) = tightKeyNorm(x): tight output has no
      // whitespace, is upper-cased, and placeholders are already gone
      case StringKernelCall(inner @ StringKernelCall(_, "tightKeyNorm"), "keyNorm") =>
        inner
      // tightKeyNorm(keyNorm(x)) = tightKeyNorm(x)
      case StringKernelCall(StringKernelCall(x, "keyNorm"), "tightKeyNorm") =>
        StringKernelCall(x, "tightKeyNorm")
    }
}
