package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for the dot product of two double arrays —
  * the hot inner loop of similarity search (SURVEY.md §2C).
  *
  * The composed-functions formulation (`aggregate(zip_with(a,b,*),+)`)
  * allocates an intermediate array per row and evaluates two lambda
  * closures per element; this expression is a single fused primitive
  * loop, participates in whole-stage codegen via `doGenCode`, and
  * allocates nothing. Preference order per SURVEY.md §3: built-in
  * functions → native Expression (this) → UDF (never).
  *
  * Accumulation is sequential in index order — bit-identical to the
  * fold it replaces, so oracle comparisons are unaffected.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double> inputs, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $x.getDouble($i) * $y.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}

/** Fused cosine similarity: dot(a,b), |a|², |b|² accumulated in ONE
  * loop over the arrays (the separate-dot formulation walks them three
  * times). Each accumulator runs in sequential index order, so results
  * are bit-identical to the composed form it replaces — oracle
  * comparisons unaffected. The cross term runs over min(len) like
  * DotProduct, but each norm runs over ITS OWN array's full length, so
  * unequal-length inputs still get true norms (identical to the
  * composed dot(a,b)/(√dot(a,a)·√dot(b,b)) form; equal lengths — the
  * only shape the pipelines produce — never enter the tail loops). */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double> inputs, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements(); val ny = y.numElements()
    val n = math.min(nx, ny)
    var xy = 0.0; var xx = 0.0; var yy = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      xy += xi * yi; xx += xi * xi; yy += yi * yi
      i += 1
    }
    while (i < nx) { val xi = x.getDouble(i); xx += xi * xi; i += 1 }
    i = n
    while (i < ny) { val yi = y.getDouble(i); yy += yi * yi; i += 1 }
    xy / (math.sqrt(xx) * math.sqrt(yy))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val xy = ctx.freshName("xy")
      val xx = ctx.freshName("xx")
      val yy = ctx.freshName("yy")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      s"""
         |int $nx = $x.numElements(); int $ny = $y.numElements();
         |int $n = java.lang.Math.min($nx, $ny);
         |double $xy = 0.0; double $xx = 0.0; double $yy = 0.0;
         |int $i = 0;
         |for (; $i < $n; $i++) {
         |  double $xi = $x.getDouble($i); double $yi = $y.getDouble($i);
         |  $xy += $xi * $yi; $xx += $xi * $xi; $yy += $yi * $yi;
         |}
         |for (; $i < $nx; $i++) { double $xi = $x.getDouble($i); $xx += $xi * $xi; }
         |for ($i = $n; $i < $ny; $i++) { double $yi = $y.getDouble($i); $yy += $yi * $yi; }
         |${ev.value} = $xy / (java.lang.Math.sqrt($xx) * java.lang.Math.sqrt($yy));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(left = l, right = r)
}

/** All-k MinHash signatures in ONE pass over a document's token array:
  * sig[i] = min over tokens of h1(tok) + i·h2(tok) (64-bit wraparound,
  * signed min), where (h1, h2) are the two md5 halves
  * ([[HashUtil.md5Hash128]]) — the Kirsch-Mitzenmacher construction
  * (two base hashes simulate k independent ones with no loss for LSH
  * purposes). Computed per-row with no explode, no shuffle, and full
  * whole-stage codegen: one digest + k multiply-adds per token beats
  * the previous k-independent-xxhash64 loop AND is md5-derived, so
  * persisted signature sidecars are re-derivable by ANY engine and
  * the full dedup_minhash output is oracle-checked value-for-value.
  * Bit-identical to the explode + groupBy(k × min) formulation
  * (spec-pinned against a driver-side reimplementation). */
case class MinHashSigs(child: Expression, k: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.catalyst.util.GenericArrayData
  import org.apache.spark.sql.types.{ArrayType, LongType, StringType}

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val buf = new Array[Long](2)
    val mins = Array.fill(k)(Long.MaxValue)
    var j = 0
    while (j < arr.numElements()) {
      if (!arr.isNullAt(j)) {
        val s = arr.getUTF8String(j)
        // Kirsch-Mitzenmacher: one md5 per token, permutation i is
        // h1 + i*h2 (64-bit wraparound) — signed-long min per slot
        HashUtil.md5Hash128(s, buf)
        var h = buf(0)
        var i = 0
        while (i < k) {
          if (h < mins(i)) mins(i) = h
          h += buf(1)
          i += 1
        }
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val buf = ctx.addMutableState("long[]", "graftMd5Buf", v => s"$v = new long[2];")
    nullSafeCodeGen(ctx, ev, arr => {
      val mins = ctx.freshName("mins")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      s"""
         |long[] $mins = new long[$k];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $j = 0; $j < $arr.numElements(); $j++) {
         |  if (!$arr.isNullAt($j)) {
         |    org.apache.spark.unsafe.types.UTF8String $s = $arr.getUTF8String($j);
         |    graft.functions.HashUtil.md5Hash128($s, $buf);
         |    long $h = $buf[0];
         |    for (int $i = 0; $i < $k; $i++) {
         |      if ($h < $mins[$i]) $mins[$i] = $h;
         |      $h += $buf[1];
         |    }
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): MinHashSigs =
    copy(child = c)
}

/** Hashing-trick dimension of a token (r15): the value of
  * `pmod(conv(substring(md5(tok), 1, 8), 16, 10)::long, dims)` — i.e.
  * the first 4 md5 digest bytes big-endian (= first 8 hex chars) taken
  * unsigned, mod dims — as ONE fused codegen'd primitive. The SQL
  * formulation materializes a 32-char hex string, a substring and a
  * base-16 string parse PER TOKEN OCCURRENCE on the hashVectors hot
  * path (every hash-embedding build walks the whole corpus token
  * stream); this computes the identical value from the raw digest with
  * zero string allocation. Oracle parity is structural: the oracle
  * keeps the arithmetic formulation, and text_hashvec / text_embed are
  * value-checked against it (plus HashDimSpec pins this expression to
  * the SQL form over random tokens). */
case class HashedDim(child: Expression, dims: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.types.{LongType, StringType}

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hashed_dim"

  override protected def nullSafeEval(input: Any): Any = {
    val buf = new Array[Long](2)
    HashUtil.md5Hash128(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], buf)
    // first 4 digest bytes as unsigned 32-bit ≡ conv(substr(hex,1,8),16,10)
    (buf(0) >>> 32) % dims
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val buf = ctx.addMutableState("long[]", "graftMd5Buf", v => s"$v = new long[2];")
    nullSafeCodeGen(ctx, ev, s => {
      s"""
         |graft.functions.HashUtil.md5Hash128($s, $buf);
         |${ev.value} = ($buf[0] >>> 32) % ${dims}L;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): HashedDim =
    copy(child = c)
}

/** md5-derived 64-bit token hash: the first 8 digest bytes big-endian,
  * i.e. the bit pattern of `('0x' || substr(md5(tok), 1, 16))::UBIGINT`
  * in any engine with md5 — the engine-reproducibility contract that
  * makes persisted SimHash signature sidecars re-derivable (and the
  * whole dedup_simhash output oracle-checkable) without an
  * engine-private hash like xxhash64. ThreadLocal digest: one
  * MessageDigest per executor thread, no per-row allocation. */
object HashUtil {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  def md5Hash64(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val d = md.get()
    d.reset()
    val dig = d.digest(s.getBytes)
    be64(dig, 0)
  }

  /** Both 64-bit halves of the md5 digest (big-endian), written into
    * `out(0)` / `out(1)` — the bit patterns of
    * `('0x' || substr(md5(tok), 1|17, 16))::UBIGINT`. Caller supplies
    * the 2-slot buffer so the per-token hot loop (MinHashSigs) does
    * zero allocation. */
  def md5Hash128(s: org.apache.spark.unsafe.types.UTF8String,
                 out: Array[Long]): Unit = {
    val d = md.get()
    d.reset()
    val dig = d.digest(s.getBytes)
    out(0) = be64(dig, 0)
    out(1) = be64(dig, 8)
  }

  private def be64(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 56)     | ((b(o + 1) & 0xffL) << 48) |
    ((b(o + 2) & 0xffL) << 40) | ((b(o + 3) & 0xffL) << 32) |
    ((b(o + 4) & 0xffL) << 24) | ((b(o + 5) & 0xffL) << 16) |
    ((b(o + 6) & 0xffL) << 8)  |  (b(o + 7) & 0xffL)
}

/** One-pass 64-bit SimHash over a token array: per-bit ±1 votes from
  * each token's md5-derived hash ([[HashUtil.md5Hash64]]), sign of
  * the vote sum becomes the bit. Replaces the explode + 64 sum-
  * aggregates formulation with a map-only, codegen'd per-row loop —
  * bit-identical output, zero shuffle; md5 (not xxhash64) so any
  * engine re-derives published signatures value-for-value. */
case class SimHashSig(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.types.{ArrayType, LongType, StringType}

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "graft_simhash"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var j = 0
    while (j < arr.numElements()) {
      if (!arr.isNullAt(j)) {
        val s = arr.getUTF8String(j)
        val h = HashUtil.md5Hash64(s)
        var i = 0
        while (i < 64) {
          votes(i) += (if (((h >>> i) & 1L) == 1L) 1 else -1)
          i += 1
        }
      }
      j += 1
    }
    var sig = 0L
    var i = 0
    while (i < 64) { if (votes(i) > 0) sig |= (1L << i); i += 1 }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, arr => {
      val votes = ctx.freshName("votes")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      val sig = ctx.freshName("sig")
      s"""
         |int[] $votes = new int[64];
         |for (int $j = 0; $j < $arr.numElements(); $j++) {
         |  if (!$arr.isNullAt($j)) {
         |    org.apache.spark.unsafe.types.UTF8String $s = $arr.getUTF8String($j);
         |    long $h = graft.functions.HashUtil.md5Hash64($s);
         |    for (int $i = 0; $i < 64; $i++) {
         |      $votes[$i] += ((($h >>> $i) & 1L) == 1L) ? 1 : -1;
         |    }
         |  }
         |}
         |long $sig = 0L;
         |for (int $i = 0; $i < 64; $i++) {
         |  if ($votes[$i] > 0) $sig |= (1L << $i);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): SimHashSig =
    copy(child = c)
}

/** One-pass sign-LSH signature over a double vector: bit p of the
  * result is the sign of the dot product with pseudo-random hyperplane
  * p, whose component j is `pmod(xxhash64(p, j), 2000001)/1e6 - 1`
  * (hash-derived in [-1,1], reproducible anywhere). Bit-identical to
  * the aggregate(zip_with(...)) formulation it replaces — same seed
  * chain (42 → hashInt(p) → hashInt(j)), same sequential accumulation —
  * with no per-plane intermediate arrays.
  *
  * `mean` (r15): optional mean-centering FUSED into the signature —
  * component j contributes `(v[j] − mean[j]) · plane[j]` (missing mean
  * component = 0, exactly [[graft.pipeline.Similarity.centeredCol]]'s
  * try_element_at semantics, in the same IEEE order: subtract, then
  * multiply-accumulate). The previous composition signed the output of
  * an ArrayTransform higher-order expression, which is CodegenFallback:
  * every signing row paid an interpreted 64-lambda evaluation with
  * boxing AND knocked the whole stage out of whole-stage codegen —
  * measured ~500 µs/row on the bitext ring stage at sf0.1. Fused, the
  * centering is two extra JIT'd flops per component. */
case class SignLshSig(child: Expression, planes: Int,
                      mean: Seq[Double] = Nil)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.catalyst.expressions.XXH64
  import org.apache.spark.sql.types.LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_sign_lsh"

  private lazy val meanArr: Array[Double] = mean.toArray

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    val mu = meanArr
    var sig = 0L
    var p = 0
    while (p < planes) {
      val seed = XXH64.hashInt(p, 42L)
      var acc = 0.0
      var j = 0
      while (j < n) {
        val h = XXH64.hashInt(j, seed)
        val m = ((h % 2000001L) + 2000001L) % 2000001L
        val c = v.getDouble(j) - (if (j < mu.length) mu(j) else 0.0)
        acc += c * (m / 1000000.0 - 1.0)
        j += 1
      }
      if (acc > 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val xxh = "org.apache.spark.sql.catalyst.expressions.XXH64"
    nullSafeCodeGen(ctx, ev, v => {
      val sig = ctx.freshName("sig")
      val p = ctx.freshName("p")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val seed = ctx.freshName("seed")
      val h = ctx.freshName("h")
      val m = ctx.freshName("m")
      val c = ctx.freshName("cv")
      val mu = ctx.addReferenceObj("mean", meanArr, "double[]")
      s"""
         |int $n = $v.numElements();
         |long $sig = 0L;
         |for (int $p = 0; $p < $planes; $p++) {
         |  long $seed = $xxh.hashInt($p, 42L);
         |  double $acc = 0.0;
         |  for (int $j = 0; $j < $n; $j++) {
         |    long $h = $xxh.hashInt($j, $seed);
         |    long $m = (($h % 2000001L) + 2000001L) % 2000001L;
         |    double $c = $v.getDouble($j) - ($j < $mu.length ? $mu[$j] : 0.0);
         |    $acc += $c * ($m / 1000000.0 - 1.0);
         |  }
         |  if ($acc > 0) $sig |= (1L << $p);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): SignLshSig =
    copy(child = c)
}

object VectorExpressions {
  /** Column-API entry point for the codegen'd dot product. */
  def dot(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))

  /** Fused one-pass cosine similarity (native expression). */
  def cosine(a: Column, b: Column): Column =
    Bridge.column(CosineSim(Bridge.expression(a), Bridge.expression(b)))

  /** One-pass all-k MinHash signature (native expression). */
  def minhashSigs(tokens: Column, k: Int): Column =
    Bridge.column(MinHashSigs(Bridge.expression(tokens), k))

  /** Fused hashing-trick dimension (native expression; r15). */
  def hashedDim(tok: Column, dims: Int): Column =
    Bridge.column(HashedDim(Bridge.expression(tok), dims))

  /** One-pass 64-bit SimHash signature (native expression). */
  def simhashSig(tokens: Column): Column =
    Bridge.column(SimHashSig(Bridge.expression(tokens)))

  /** One-pass sign-LSH bucket signature (native expression). */
  def signLsh(vec: Column, planes: Int, mean: Seq[Double] = Nil): Column =
    Bridge.column(SignLshSig(Bridge.expression(vec), planes, mean))

  /** Arity-checked builder for a binary native function: a wrong
    * argument count raises the standard `WRONG_NUM_ARGS`
    * AnalysisException naming the function — never an
    * IndexOutOfBoundsException from `children(1)`. The ONE builder
    * shared by [[register]] and the GraftExtensions cluster entry
    * points. */
  private[graft] def binaryBuilder(name: String,
      make: (Expression, Expression) => Expression): Seq[Expression] => Expression =
    children => {
      if (children.length != 2)
        throw new org.apache.spark.sql.AnalysisException(
          errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
          messageParameters = Map(
            "functionName" -> s"`$name`", "expectedNum" -> "2",
            "actualNum" -> children.length.toString,
            "docroot" -> "https://spark.apache.org/docs/latest"))
      make(children(0), children(1))
    }

  /** (name, ExpressionInfo, arity-checked builder) for each graft SQL
    * function — the single source of truth for both registration
    * routes. */
  private[graft] def sqlFunctions: Seq[(String,
      org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    ("graft_dot",
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[DotProduct].getCanonicalName, "graft_dot"),
      binaryBuilder("graft_dot", DotProduct.apply)),
    ("graft_cosine",
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[CosineSim].getCanonicalName, "graft_cosine"),
      binaryBuilder("graft_cosine", CosineSim.apply)))

  /** Register `graft_dot` / `graft_cosine` into a session's SQL
    * function registry so `spark.sql("SELECT graft_dot(a, b)")` works.
    * (For cluster deploys the same builders are wired through
    * SparkSessionExtensions.injectFunction at session build time —
    * [[graft.GraftExtensions]].) */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    sqlFunctions.foreach { case (name, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(
        org.apache.spark.sql.catalyst.FunctionIdentifier(name), info, builder)
    }
}
