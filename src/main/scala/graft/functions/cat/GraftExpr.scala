package graft.functions.cat

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, DoubleType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the engine's hot scalar functions.
  *
  * Each one generates a single static call into [[Kernels]] — compact
  * generated code (the combinator forms of these functions blew past
  * Janino's 64KB method limit in the 85-column flight projection and
  * forced interpreted fallback) and a hand-rolled, regex-free inner
  * loop. `nullSafeEval` provides the interpreted path, so the
  * expressions behave under both codegen factory modes.
  */
object GraftExpr {

  /** fn name in [[Kernels]] -> (result type, can a non-null input
    * produce a null result). */
  private val Sigs: Map[String, (DataType, Boolean)] = Map(
    "timeHhmm" -> (StringType, false),
    "dateYyyySlash" -> (StringType, false),
    "durationMinutes" -> (IntegerType, true),
    "luggageValue" -> (DoubleType, true),
    "luggageUnit" -> (StringType, false),
    "luggageRecompose" -> (StringType, false),
    "airlineCode" -> (StringType, false),
    "headToken" -> (StringType, true),
    "keyNorm" -> (StringType, false),
    "tightKeyNorm" -> (StringType, false),
    "flightNorm" -> (StringType, false),
    "flightValid" -> (BooleanType, false),
    "dateKeyMmDd" -> (StringType, false),
    "simhash60" -> (LongType, false))

  private def eval1(fn: String, in: UTF8String): Any = fn match {
    case "timeHhmm" => Kernels.timeHhmm(in)
    case "dateYyyySlash" => Kernels.dateYyyySlash(in)
    case "durationMinutes" => Kernels.durationMinutes(in)
    case "luggageValue" => Kernels.luggageValue(in)
    case "luggageUnit" => Kernels.luggageUnit(in)
    case "luggageRecompose" => Kernels.luggageRecompose(in)
    case "airlineCode" => Kernels.airlineCode(in)
    case "headToken" => Kernels.headToken(in)
    case "keyNorm" => Kernels.keyNorm(in)
    case "tightKeyNorm" => Kernels.tightKeyNorm(in)
    case "flightNorm" => Kernels.flightNorm(in)
    case "flightValid" => Kernels.flightValid(in)
    case "dateKeyMmDd" => Kernels.dateKeyMmDd(in)
    case "simhash60" => Kernels.simhash60(in)
  }

  /** Column-level entry point used by the function builders. */
  def call(fn: String, c: Column): Column =
    Bridge.column(StringKernelCall(Bridge.expression(c), fn))

  /** The callers ([[graft.functions]] builders) always cast the child to
    * string, so no ExpectsInputTypes coercion is needed. */
  case class StringKernelCall(child: Expression, fn: String)
      extends UnaryExpression {

    private val (resultType, fnNullable) = Sigs(fn)

    override def dataType: DataType = resultType
    override def nullable: Boolean = child.nullable || fnNullable
    override def prettyName: String = s"graft_$fn"

    override protected def nullSafeEval(input: Any): Any =
      eval1(fn, input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val kernels = "graft.functions.cat.Kernels"
      if (!fnNullable) {
        val javaCast = resultType match {
          case BooleanType => (v: String) => s"$v.booleanValue()"
          case _ => (v: String) => v
        }
        defineCodeGen(ctx, ev, c => javaCast(s"$kernels.$fn($c)"))
      } else {
        val boxed = resultType match {
          case IntegerType => "java.lang.Integer"
          case DoubleType => "java.lang.Double"
          case _ => "org.apache.spark.unsafe.types.UTF8String"
        }
        val unbox = resultType match {
          case IntegerType => ".intValue()"
          case DoubleType => ".doubleValue()"
          case _ => ""
        }
        nullSafeCodeGen(ctx, ev, c => {
          val tmp = ctx.freshName("kres")
          s"""
             |$boxed $tmp = $kernels.$fn($c);
             |if ($tmp == null) { ${ev.isNull} = true; }
             |else { ${ev.value} = $tmp$unbox; }
           """.stripMargin
        })
      }
    }

    override protected def withNewChildInternal(newChild: Expression): StringKernelCall =
      copy(child = newChild)
  }

  def polyHash(c: Column, base: Int, p: Long): Column =
    Bridge.column(PolyHashCall(Bridge.expression(c), base, p))

  /** Parameterized polynomial hash (see [[Kernels.polyHash]]). */
  case class PolyHashCall(child: Expression, base: Int, p: Long)
      extends UnaryExpression {

    override def dataType: DataType = LongType
    override def prettyName: String = "graft_poly_hash"

    override protected def nullSafeEval(input: Any): Any =
      Kernels.polyHash(input.asInstanceOf[UTF8String], base, p)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"graft.functions.cat.Kernels.polyHash($c, $base, ${p}L)")

    override protected def withNewChildInternal(newChild: Expression): PolyHashCall =
      copy(child = newChild)
  }

  def lshBuckets(c: Column, tables: Int, bits: Int): Column =
    Bridge.column(LshBucketsCall(Bridge.expression(c), tables, bits))

  /** Multi-table sign-LSH bucket array (see [[Kernels.lcgBuckets]]). */
  case class LshBucketsCall(child: Expression, tables: Int, bits: Int)
      extends UnaryExpression {

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_lsh_buckets"

    override protected def nullSafeEval(input: Any): Any =
      Kernels.lcgBuckets(input.asInstanceOf[ArrayData], tables, bits)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"graft.functions.cat.Kernels.lcgBuckets($c, $tables, $bits)")

    override protected def withNewChildInternal(newChild: Expression): LshBucketsCall =
      copy(child = newChild)
  }

  def nearestCentroid(vec: Column, cents: Column, dim: Int): Column =
    Bridge.column(NearestCentroidCall(Bridge.expression(vec), Bridge.expression(cents), dim))

  /** Argmax-cosine centroid position (see [[Kernels.nearestCentroid]]).
    * The centroid matrix child is a foldable literal array, so codegen
    * hoists it into a constant. */
  case class NearestCentroidCall(left: Expression, right: Expression, dim: Int)
      extends BinaryExpression {

    override def dataType: DataType = IntegerType
    override def prettyName: String = "graft_nearest_centroid"

    override protected def nullSafeEval(vec: Any, cents: Any): Any =
      Kernels.nearestCentroid(vec.asInstanceOf[ArrayData], cents.asInstanceOf[ArrayData], dim)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        (v, c) => s"graft.functions.cat.Kernels.nearestCentroid($v, $c, $dim)")

    override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): NearestCentroidCall =
      copy(left = newLeft, right = newRight)
  }

  def minhash32(c: Column, k: Int): Column =
    Bridge.column(Minhash32Call(Bridge.expression(c), k))

  /** Single-pass MinHash signature array (see [[Kernels.minhash32]]). */
  case class Minhash32Call(child: Expression, k: Int)
      extends UnaryExpression {

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = true
    override def prettyName: String = "graft_minhash32"

    override protected def nullSafeEval(input: Any): Any =
      Kernels.minhash32(input.asInstanceOf[UTF8String], k)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        val tmp = ctx.freshName("mh")
        s"""
           |org.apache.spark.sql.catalyst.util.ArrayData $tmp =
           |  graft.functions.cat.Kernels.minhash32($c, $k);
           |if ($tmp == null) { ${ev.isNull} = true; }
           |else { ${ev.value} = $tmp; }
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Minhash32Call =
      copy(child = newChild)
  }

  def shingleHashes(c: Column, k: Int): Column =
    Bridge.column(ShingleHashesCall(Bridge.expression(c), k))

  /** Distinct hashed k-shingles (see [[Kernels.shingleHashes]]). */
  case class ShingleHashesCall(child: Expression, k: Int)
      extends UnaryExpression {

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_shingle_hashes"

    override protected def nullSafeEval(input: Any): Any =
      Kernels.shingleHashes(input.asInstanceOf[UTF8String], k)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"graft.functions.cat.Kernels.shingleHashes($c, $k)")

    override protected def withNewChildInternal(newChild: Expression): ShingleHashesCall =
      copy(child = newChild)
  }

  def cosineFF(a: Column, b: Column): Column =
    Bridge.column(CosineFFCall(Bridge.expression(a), Bridge.expression(b)))

  /** Float-vector cosine similarity (see [[Kernels.cosineFF]]). Both
    * children must be array<float>. */
  case class CosineFFCall(left: Expression, right: Expression)
      extends BinaryExpression {

    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_cosine"

    override protected def nullSafeEval(a: Any, b: Any): Any =
      Kernels.cosineFF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        (a, b) => s"graft.functions.cat.Kernels.cosineFF($a, $b)")

    override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CosineFFCall =
      copy(left = newLeft, right = newRight)
  }

  def bloomMightContain(key: Column, bloom: Column, k: Int): Column =
    Bridge.column(BloomMightContainCall(Bridge.expression(key), Bridge.expression(bloom), k))

  /** Bloom membership probe (see [[Kernels.bloomMightContain]]). The
    * bloom child is a foldable literal/broadcast array, so codegen
    * hoists it into a constant and the probe runs in the scan stage. */
  case class BloomMightContainCall(left: Expression, right: Expression, k: Int)
      extends BinaryExpression {

    override def dataType: DataType = BooleanType
    override def prettyName: String = "graft_bloom_might_contain"

    override protected def nullSafeEval(key: Any, bloom: Any): Any =
      Kernels.bloomMightContain(key.asInstanceOf[Long], bloom.asInstanceOf[ArrayData], k)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        (key, bloom) => s"graft.functions.cat.Kernels.bloomMightContain($key, $bloom, $k)")

    override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): BloomMightContainCall =
      copy(left = newLeft, right = newRight)
  }

  def bloomMightContainBcast(key: Column,
      bloom: org.apache.spark.broadcast.Broadcast[Array[Long]], k: Int): Column =
    Bridge.column(BloomMightContainBcastCall(Bridge.expression(key), bloom, k))

  /** Bloom membership probe reading the bitset from a BROADCAST
    * variable instead of a plan literal — the large-filter path
    * (`BloomJoin.LiteralBloomMaxBytes`): the bitset is shipped to each
    * executor once, and the generated code reads it through a
    * task-context reference rather than re-serializing it into every
    * task's plan. */
  case class BloomMightContainBcastCall(child: Expression,
      bloom: org.apache.spark.broadcast.Broadcast[Array[Long]], k: Int)
      extends UnaryExpression {

    override def dataType: DataType = BooleanType
    override def prettyName: String = "graft_bloom_might_contain_bcast"

    override protected def nullSafeEval(key: Any): Any =
      Kernels.bloomMightContainWords(key.asInstanceOf[Long], bloom.value, k)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val bcRef = ctx.addReferenceObj("bloomBc", bloom,
        "org.apache.spark.broadcast.Broadcast")
      defineCodeGen(ctx, ev,
        key => s"graft.functions.cat.Kernels.bloomMightContainWords($key, (long[]) $bcRef.value(), $k)")
    }

    override protected def withNewChildInternal(newChild: Expression): BloomMightContainBcastCall =
      copy(child = newChild)
  }

  def signBuckets(vec: Column, planes: Array[Array[Double]]): Column =
    Bridge.column(SignBucketCall(Bridge.expression(vec), planes))

  /** Sign-LSH bucket against an explicit hyperplane matrix (see
    * [[Kernels.signBucket]]) — the codegen'd production form of
    * `Similarity.signBucket`'s combinator, folding in the same element
    * order for bit-identical buckets. The matrix rides the expression
    * as a referenced object, not a plan literal. */
  case class SignBucketCall(child: Expression, planes: Array[Array[Double]])
      extends UnaryExpression {

    override def dataType: DataType = LongType
    override def prettyName: String = "graft_sign_bucket"

    override protected def nullSafeEval(input: Any): Any =
      Kernels.signBucket(input.asInstanceOf[ArrayData], planes)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("planes", planes, "double[][]")
      defineCodeGen(ctx, ev,
        c => s"graft.functions.cat.Kernels.signBucket($c, $ref)")
    }

    override protected def withNewChildInternal(newChild: Expression): SignBucketCall =
      copy(child = newChild)
  }

  def zorder2(a: Column, b: Column, bits: Int): Column =
    Bridge.column(Zorder2Call(Bridge.expression(a), Bridge.expression(b), bits))

  /** Morton interleave of two keys (see [[Kernels.zorder2]]). */
  case class Zorder2Call(left: Expression, right: Expression, bits: Int)
      extends BinaryExpression {

    override def dataType: DataType = LongType
    override def prettyName: String = "graft_zorder2"

    override protected def nullSafeEval(a: Any, b: Any): Any =
      Kernels.zorder2(a.asInstanceOf[Long], b.asInstanceOf[Long], bits)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        (a, b) => s"graft.functions.cat.Kernels.zorder2($a, $b, $bits)")

    override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Zorder2Call =
      copy(left = newLeft, right = newRight)
  }

  def chunkSplit(c: Column, w: Int): Column =
    Bridge.column(ChunkSplitCall(Bridge.expression(c), w))

  /** Consecutive w-word chunks of a text (see [[Kernels.chunkSplit]]). */
  case class ChunkSplitCall(child: Expression, w: Int)
      extends UnaryExpression {

    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "graft_chunk_split"

    override protected def nullSafeEval(input: Any): Any =
      Kernels.chunkSplit(input.asInstanceOf[UTF8String], w)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"graft.functions.cat.Kernels.chunkSplit($c, $w)")

    override protected def withNewChildInternal(newChild: Expression): ChunkSplitCall =
      copy(child = newChild)
  }

  def quantize127(c: Column): Column =
    Bridge.column(Quantize127Call(Bridge.expression(c)))

  /** Symmetric int8 quantization of a float vector
    * (see [[Kernels.quantize127]]). */
  case class Quantize127Call(child: Expression)
      extends UnaryExpression {

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_quantize127"

    override protected def nullSafeEval(input: Any): Any =
      Kernels.quantize127(input.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"graft.functions.cat.Kernels.quantize127($c)")

    override protected def withNewChildInternal(newChild: Expression): Quantize127Call =
      copy(child = newChild)
  }

  def dotLong(a: Column, b: Column): Column =
    Bridge.column(DotLongCall(Bridge.expression(a), Bridge.expression(b)))

  /** Exact integer dot product of two long arrays
    * (see [[Kernels.dotLong]]). */
  case class DotLongCall(left: Expression, right: Expression)
      extends BinaryExpression {

    override def dataType: DataType = LongType
    override def prettyName: String = "graft_dot_long"

    override protected def nullSafeEval(a: Any, b: Any): Any =
      Kernels.dotLong(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        (a, b) => s"graft.functions.cat.Kernels.dotLong($a, $b)")

    override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotLongCall =
      copy(left = newLeft, right = newRight)
  }

  def nearestSubCentroidL2(vec: Column, cents: Column, offset: Int, ds: Int): Column =
    Bridge.column(NearestSubCentroidL2Call(
      Bridge.expression(vec), Bridge.expression(cents), offset, ds))

  /** Argmin-L2 PQ codeword for one subspace
    * (see [[Kernels.nearestSubCentroidL2]]). */
  case class NearestSubCentroidL2Call(left: Expression, right: Expression,
                                      offset: Int, ds: Int)
      extends BinaryExpression {

    override def dataType: DataType = IntegerType
    override def prettyName: String = "graft_nearest_subcentroid_l2"

    override protected def nullSafeEval(vec: Any, cents: Any): Any =
      Kernels.nearestSubCentroidL2(vec.asInstanceOf[ArrayData],
        cents.asInstanceOf[ArrayData], offset, ds)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        (v, c) => s"graft.functions.cat.Kernels.nearestSubCentroidL2($v, $c, $offset, $ds)")

    override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): NearestSubCentroidL2Call =
      copy(left = newLeft, right = newRight)
  }

  def pqLut(q: Column, cbooks: Column, m: Int, ks: Int, ds: Int): Column =
    Bridge.column(PqLutCall(Bridge.expression(q), Bridge.expression(cbooks), m, ks, ds))

  /** Per-query ADC lookup table (see [[Kernels.pqLut]]). */
  case class PqLutCall(left: Expression, right: Expression, m: Int, ks: Int, ds: Int)
      extends BinaryExpression {

    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def prettyName: String = "graft_pq_lut"

    override protected def nullSafeEval(q: Any, cb: Any): Any =
      Kernels.pqLut(q.asInstanceOf[ArrayData], cb.asInstanceOf[ArrayData], m, ks, ds)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        (q, cb) => s"graft.functions.cat.Kernels.pqLut($q, $cb, $m, $ks, $ds)")

    override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): PqLutCall =
      copy(left = newLeft, right = newRight)
  }

  def pqAdcSum(lut: Column, codes: Column, ks: Int): Column =
    Bridge.column(PqAdcSumCall(Bridge.expression(lut), Bridge.expression(codes), ks))

  /** ADC score from lut + codes (see [[Kernels.pqAdcSum]]). */
  case class PqAdcSumCall(left: Expression, right: Expression, ks: Int)
      extends BinaryExpression {

    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_pq_adc_sum"

    override protected def nullSafeEval(lut: Any, codes: Any): Any =
      Kernels.pqAdcSum(lut.asInstanceOf[ArrayData], codes.asInstanceOf[ArrayData], ks)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        (l, c) => s"graft.functions.cat.Kernels.pqAdcSum($l, $c, $ks)")

    override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): PqAdcSumCall =
      copy(left = newLeft, right = newRight)
  }
}
