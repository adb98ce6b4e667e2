package graft.functions.catalyst

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd Catalyst expressions for the hot scalar kernels
  * (SURVEY.md §2.8). All hashing is plain 64-bit integer arithmetic so
  * the DuckDB oracle can reproduce it bit-for-bit with SQL lambdas:
  *   poly(s, B, M) = fold over UTF-16 units: h = (h*B + c) mod M
  * (equal to codepoint folding for the ASCII corpus).
  */
object GraftHash {
  final val P1 = 1073741789L // < 2^30
  final val P2 = 536870909L  // < 2^29
  final val FP = 1000000007L

  def poly(s: String, base: Long, mod: Long): Long = {
    var h = 0L; var i = 0
    while (i < s.length) { h = (h * base + s.charAt(i)) % mod; i += 1 }
    h
  }
  /** ~59-bit word hash from two independent polynomial hashes. */
  def word64(s: String): Long = (poly(s, 31, P1) << 30) | poly(s, 37, P2)
}

/** Polynomial rolling hash of a string: fold (h*base + char) mod `mod`.
  *
  * Codegen discipline for every expression in this file: the generated
  * body is wrapped in its own Java block so the fixed `g*` locals are
  * scoped — with non-nullable children nullSafeCodeGen emits the body
  * UNBRACED, and two such expressions in one codegen scope would
  * redeclare the locals, fail Janino, and silently fall back to
  * interpreted (the exact slow path these expressions exist to avoid).
  * `ev.value` is declared by nullSafeCodeGen outside the block, so the
  * final assignment escapes the scope.
  */
case class PolyHash(child: Expression, base: Int, mod: Long)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    GraftHash.poly(v.asInstanceOf[UTF8String].toString, base, mod)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      {
      String gs = $c.toString();
      long gh = 0L;
      for (int gi = 0; gi < gs.length(); gi++) {
        gh = (gh * ${base}L + gs.charAt(gi)) % ${mod}L;
      }
      ${ev.value} = gh;
      }""")
  override protected def withNewChildInternal(c: Expression): PolyHash = copy(child = c)
}

/** 60-bit SimHash over an array of tokens: per token a 59-bit word hash;
  * bit b of the result is 1 iff sum over tokens of (+1/-1 by hash bit b)
  * is >= 0.
  */
case class SimHash60(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val acc = new Array[Int](60)
    var t = 0
    while (t < arr.numElements()) {
      val h = GraftHash.word64(arr.getUTF8String(t).toString)
      var b = 0
      while (b < 60) {
        if (((h >> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
        b += 1
      }
      t += 1
    }
    var out = 0L; var b = 0
    while (b < 60) { if (acc(b) >= 0) out |= (1L << b); b += 1 }
    out
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      {
      int[] gacc = new int[60];
      for (int gt = 0; gt < $c.numElements(); gt++) {
        String gw = $c.getUTF8String(gt).toString();
        long gh1 = 0L; long gh2 = 0L;
        for (int gi = 0; gi < gw.length(); gi++) {
          gh1 = (gh1 * 31L + gw.charAt(gi)) % ${GraftHash.P1}L;
          gh2 = (gh2 * 37L + gw.charAt(gi)) % ${GraftHash.P2}L;
        }
        long gh = (gh1 << 30) | gh2;
        for (int gb = 0; gb < 60; gb++) {
          if (((gh >> gb) & 1L) == 1L) gacc[gb]++; else gacc[gb]--;
        }
      }
      long gout = 0L;
      for (int gb = 0; gb < 60; gb++) { if (gacc[gb] >= 0) gout |= (1L << gb); }
      ${ev.value} = gout;
      }""")
  override protected def withNewChildInternal(c: Expression): SimHash60 = copy(child = c)
}

/** MinHash signature of a string set: sig[j] = min over elements x of
  * (a_j * h(x) + b_j) mod 1e9+7, with h = poly(x, 31, P1) and
  * a_j = (2654435761 * (j+1)) mod p, b_j = (1013904223 * (j+7)) mod p.
  * The multipliers must be large "random" constants: with small a_j the
  * affine maps nearly preserve the ordering of h, the same element wins
  * the min for every j, and the 128 "independent" hashes collapse into
  * one — banding then massively over-generates candidates.
  * Empty input yields sig[j] = 1e9+7 (an impossible hash) so empty sets
  * never collide with real ones.
  */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private def aj(j: Int): Long = {
    val a = (2654435761L * (j + 1)) % GraftHash.FP
    if (a == 0L) 1L else a
  }
  private def bj(j: Int): Long = (1013904223L * (j + 7)) % GraftHash.FP

  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val sig = Array.fill(numHashes)(GraftHash.FP)
    var t = 0
    while (t < arr.numElements()) {
      val h = GraftHash.poly(arr.getUTF8String(t).toString, 31, GraftHash.P1)
      var j = 0
      while (j < numHashes) {
        val hj = (aj(j) * h + bj(j)) % GraftHash.FP
        if (hj < sig(j)) sig(j) = hj
        j += 1
      }
      t += 1
    }
    new GenericArrayData(sig)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      {
      long[] gsig = new long[$numHashes];
      java.util.Arrays.fill(gsig, ${GraftHash.FP}L);
      for (int gt = 0; gt < $c.numElements(); gt++) {
        String gw = $c.getUTF8String(gt).toString();
        long gh = 0L;
        for (int gi = 0; gi < gw.length(); gi++) {
          gh = (gh * 31L + gw.charAt(gi)) % ${GraftHash.P1}L;
        }
        for (int gj = 0; gj < $numHashes; gj++) {
          long ga = (2654435761L * (gj + 1)) % ${GraftHash.FP}L;
          if (ga == 0L) ga = 1L;
          long gb = (1013904223L * (gj + 7)) % ${GraftHash.FP}L;
          long ghj = (ga * gh + gb) % ${GraftHash.FP}L;
          if (ghj < gsig[gj]) gsig[gj] = ghj;
        }
      }
      ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(gsig);
      }""")
  override protected def withNewChildInternal(c: Expression): MinHashSig = copy(child = c)
}

/** One-pass MinHash signature straight from text — no materialized
  * token arrays, fully codegen'd. `mode` "char": windows are char
  * n-grams; "word": n-word shingles (single-space separated corpus, so
  * a shingle's string equals the text substring spanning its words and
  * hashes identically to concat_ws(' ', w1..wn)). Hash family and
  * semantics identical to MinHashSig over the tokenized set (minhash is
  * invariant under duplicate windows).
  */
case class MinHashSigText(child: Expression, mode: String, n: Int, numHashes: Int)
    extends UnaryExpression {
  require(mode == "char" || mode == "word", "mode must be char or word")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    val sig = Array.fill(numHashes)(GraftHash.FP)
    def absorb(from: Int, until: Int): Unit = {
      var h = 0L; var i = from
      while (i < until) { h = (h * 31 + s.charAt(i)) % GraftHash.P1; i += 1 }
      var j = 0
      while (j < numHashes) {
        var a = (2654435761L * (j + 1)) % GraftHash.FP
        if (a == 0L) a = 1L
        val b = (1013904223L * (j + 7)) % GraftHash.FP
        val hj = (a * h + b) % GraftHash.FP
        if (hj < sig(j)) sig(j) = hj
        j += 1
      }
    }
    if (mode == "char") {
      var i = 0
      while (i + n <= s.length) { absorb(i, i + n); i += 1 }
    } else {
      // word-boundary indices: starts of words and end positions
      val starts = scala.collection.mutable.ArrayBuffer(0)
      var i = 0
      while (i < s.length) { if (s.charAt(i) == ' ') starts += i + 1; i += 1 }
      var w = 0
      while (w + n <= starts.length) {
        val from = starts(w)
        val until = if (w + n == starts.length) s.length else starts(w + n) - 1
        absorb(from, until)
        w += 1
      }
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val absorb = s"""
        long gh = 0L;
        for (int gi = gFrom; gi < gUntil; gi++) { gh = (gh * 31L + gs.charAt(gi)) % ${GraftHash.P1}L; }
        for (int gj = 0; gj < $numHashes; gj++) {
          long ga = (2654435761L * (gj + 1)) % ${GraftHash.FP}L;
          if (ga == 0L) ga = 1L;
          long gb = (1013904223L * (gj + 7)) % ${GraftHash.FP}L;
          long ghj = (ga * gh + gb) % ${GraftHash.FP}L;
          if (ghj < gsig[gj]) gsig[gj] = ghj;
        }"""
      val body =
        if (mode == "char") s"""
          for (int gw = 0; gw + $n <= gs.length(); gw++) {
            int gFrom = gw; int gUntil = gw + $n;
            $absorb
          }"""
        else s"""
          int gnw = 1;
          for (int gi = 0; gi < gs.length(); gi++) {
            if (gs.charAt(gi) == ' ') gnw++;
          }
          int[] gst = new int[gnw];
          int gcur = 1;
          for (int gi = 0; gi < gs.length(); gi++) {
            if (gs.charAt(gi) == ' ') gst[gcur++] = gi + 1;
          }
          for (int gw = 0; gw + $n <= gnw; gw++) {
            int gFrom = gst[gw];
            int gUntil = (gw + $n == gnw) ? gs.length() : gst[gw + $n] - 1;
            $absorb
          }"""
      s"""
      {
      String gs = $c.toString();
      long[] gsig = new long[$numHashes];
      java.util.Arrays.fill(gsig, ${GraftHash.FP}L);
      $body
      ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(gsig);
      }"""
    })
  override protected def withNewChildInternal(c: Expression): MinHashSigText = copy(child = c)
}

/** Cosine similarity of two float vectors, computed in double with a
  * strict left-to-right fold (so SQL `list_reduce` reproduces it
  * bit-for-bit): dot/(sqrt(na)*sqrt(nb)).
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n)
      throw new IllegalArgumentException(
        s"cosine_sim: dimension mismatch ($n vs ${y.numElements()})")
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      {
      int gn = $a.numElements();
      if ($b.numElements() != gn) {
        throw new IllegalArgumentException("cosine_sim: dimension mismatch ("
          + gn + " vs " + $b.numElements() + ")");
      }
      double gdot = 0.0, gna = 0.0, gnb = 0.0;
      for (int gi = 0; gi < gn; gi++) {
        double gx = (double) $a.getFloat(gi);
        double gy = (double) $b.getFloat(gi);
        gdot += gx * gy; gna += gx * gx; gnb += gy * gy;
      }
      ${ev.value} = gdot / (java.lang.Math.sqrt(gna) * java.lang.Math.sqrt(gnb));
      }""")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(left = l, right = r)
}

/** Exact integer squared-L2 between two equal-length BIGINT arrays —
  * the quantized-space distance of the fixed-point k-means/PQ family
  * (Clustering.quantize coordinates). Exists because the
  * zip_with+aggregate HOF form runs INTERPRETED with a materialized
  * intermediate array per evaluation: on an n×⌈√n⌉ assignment cross
  * join (ann_graph_trained: ~450M evaluations per pass at 100×) the
  * HOF chain dominated the whole query. Arithmetic is identical
  * (long subtraction/multiply/sum, wrapping on overflow — callers
  * assert quantized bounds keep every term ≪ 2⁶³).
  */
case class SqDistLong(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n)
      throw new IllegalArgumentException(
        s"sq_dist: dimension mismatch ($n vs ${y.numElements()})")
    var s = 0L; var i = 0
    while (i < n) {
      val d = x.getLong(i) - y.getLong(i)
      s += d * d
      i += 1
    }
    s
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      {
      int gn = $a.numElements();
      if ($b.numElements() != gn) {
        throw new IllegalArgumentException("sq_dist: dimension mismatch ("
          + gn + " vs " + $b.numElements() + ")");
      }
      long gs = 0L;
      for (int gi = 0; gi < gn; gi++) {
        long gd = $a.getLong(gi) - $b.getLong(gi);
        gs += gd * gd;
      }
      ${ev.value} = gs;
      }""")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SqDistLong =
    copy(left = l, right = r)
}

/** LSH band keys from a minhash signature: key[b] = 64-bit mix of band
  * index b and the r = len/bands signature values in band b. Key
  * collisions across distinct band contents merely add candidates (the
  * exact verify downstream removes them), so wrapping arithmetic is
  * fine — this exists to avoid building band strings through
  * interpreted HOFs on the hot path.
  */
case class MinHashBands(child: Expression, bands: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any = {
    val sig = v.asInstanceOf[ArrayData]
    val n = sig.numElements()
    val r = n / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var k = b * 1315423911L
      var j = 0
      while (j < r) { k = k * 6364136223846793005L + sig.getLong(b * r + j); j += 1 }
      out(b) = k
      b += 1
    }
    new GenericArrayData(out)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      {
      int gn = $c.numElements();
      int gr = gn / $bands;
      long[] gout = new long[$bands];
      for (int gb = 0; gb < $bands; gb++) {
        long gk = gb * 1315423911L;
        for (int gj = 0; gj < gr; gj++) {
          gk = gk * 6364136223846793005L + $c.getLong(gb * gr + gj);
        }
        gout[gb] = gk;
      }
      ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(gout);
      }""")
  override protected def withNewChildInternal(c: Expression): MinHashBands = copy(child = c)
}

/** Sign-LSH bucket keys for a float vector: `bands` bands of `rowsPerBand`
  * deterministic integer hyperplanes. Plane p, component i (0-based) is
  * ((1000003*p + 7919*i) mod 97) - 48; bit = (sum_i plane*vec[i]) >= 0.
  * Band b's key is b * 2^rowsPerBand + its bit pattern — globally unique
  * per band, so keys can be joined on directly after explode.
  */
case class SignLshBuckets(child: Expression, bands: Int, rowsPerBand: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val n = x.numElements()
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var key = 0L
      var j = 0
      while (j < rowsPerBand) {
        val p = b * rowsPerBand + j
        var dot = 0.0; var i = 0
        while (i < n) {
          dot += (((1000003L * p + 7919L * i) % 97L) - 48L).toDouble * x.getFloat(i).toDouble
          i += 1
        }
        key = key * 2 + (if (dot >= 0) 1L else 0L)
        j += 1
      }
      out(b) = b.toLong * (1L << rowsPerBand) + key
      b += 1
    }
    new GenericArrayData(out)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      {
      long[] gout = new long[$bands];
      int gn = $c.numElements();
      for (int gb = 0; gb < $bands; gb++) {
        long gkey = 0L;
        for (int gj = 0; gj < $rowsPerBand; gj++) {
          int gp = gb * $rowsPerBand + gj;
          double gdot = 0.0;
          for (int gi = 0; gi < gn; gi++) {
            gdot += (double)(((1000003L * gp + 7919L * gi) % 97L) - 48L)
              * (double) $c.getFloat(gi);
          }
          gkey = gkey * 2 + (gdot >= 0 ? 1L : 0L);
        }
        gout[gb] = (long) gb * (1L << $rowsPerBand) + gkey;
      }
      ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(gout);
      }""")
  override protected def withNewChildInternal(c: Expression): SignLshBuckets = copy(child = c)
}

/** Content-defined chunking (CDC) of a string: split where the rolling
  * polynomial hash of the trailing `w` chars (base 31 mod FP, the
  * win_fp window family) satisfies hash % `mask` == 0, the Rabin-style
  * boundary rule that re-synchronizes after insertions/deletions —
  * shifted copies re-chunk identically past the edit, which fixed-size
  * shingling cannot do. Returns one packed long per chunk:
  * key = polyP1(chunk) * 2^31 + len(chunk) (chunk hash mod P1 < 2^30,
  * lengths < 2^31), so a single array<long> carries both identity and
  * size and the whole kernel stays in one codegen'd pass (O(n): the
  * window hash rolls with a precomputed B^(w-1), the chunk hash
  * accumulates alongside). Boundary candidates are positions
  * [w, len-1] (1-based window ends); end-of-string always closes the
  * final chunk, so a boundary AT len would be the same cut. Empty
  * input → empty array. The DuckDB oracle replays boundaries with the
  * text_fingerprint nested-list_reduce idiom (fresh per-position
  * window hashes == the rolled hash by modular identity).
  */
case class CdcChunks(child: Expression, w: Int, mask: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // B^(w-1) mod FP for the rolling outgoing-char removal
  private lazy val pw: Long = {
    var p = 1L; var i = 0
    while (i < w - 1) { p = (p * 31L) % GraftHash.FP; i += 1 }
    p
  }

  override protected def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    val len = s.length
    if (len == 0) return new GenericArrayData(new Array[Long](0))
    var out = new Array[Long](8)
    var nOut = 0
    var hWin = 0L; var hChunk = 0L; var chunkLen = 0L
    var i = 0
    while (i < len) {
      val c = s.charAt(i).toLong
      hWin =
        if (i < w) (hWin * 31L + c) % GraftHash.FP
        else ((hWin - (s.charAt(i - w).toLong * pw) % GraftHash.FP
          + GraftHash.FP) % GraftHash.FP * 31L + c) % GraftHash.FP
      hChunk = (hChunk * 31L + c) % GraftHash.P1
      chunkLen += 1L
      if (i >= w - 1 && i <= len - 2 && hWin % mask == 0L) {
        if (nOut == out.length) out = java.util.Arrays.copyOf(out, nOut * 2)
        out(nOut) = hChunk * 2147483648L + chunkLen
        nOut += 1
        hChunk = 0L; chunkLen = 0L
      }
      i += 1
    }
    if (nOut == out.length) out = java.util.Arrays.copyOf(out, nOut + 1)
    out(nOut) = hChunk * 2147483648L + chunkLen
    nOut += 1
    new GenericArrayData(java.util.Arrays.copyOf(out, nOut))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      {
      String gs = $c.toString();
      int glen = gs.length();
      long[] gout = new long[8];
      int gn = 0;
      if (glen > 0) {
        long ghw = 0L; long ghc = 0L; long gcl = 0L;
        for (int gi = 0; gi < glen; gi++) {
          long gc = (long) gs.charAt(gi);
          if (gi < $w) {
            ghw = (ghw * 31L + gc) % ${GraftHash.FP}L;
          } else {
            ghw = ((ghw - ((long) gs.charAt(gi - $w) * ${pw}L)
              % ${GraftHash.FP}L + ${GraftHash.FP}L) % ${GraftHash.FP}L
              * 31L + gc) % ${GraftHash.FP}L;
          }
          ghc = (ghc * 31L + gc) % ${GraftHash.P1}L;
          gcl += 1L;
          if (gi >= $w - 1 && gi <= glen - 2 && ghw % ${mask}L == 0L) {
            if (gn == gout.length) gout = java.util.Arrays.copyOf(gout, gn * 2);
            gout[gn++] = ghc * 2147483648L + gcl;
            ghc = 0L; gcl = 0L;
          }
        }
        if (gn == gout.length) gout = java.util.Arrays.copyOf(gout, gn + 1);
        gout[gn++] = ghc * 2147483648L + gcl;
      }
      ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        java.util.Arrays.copyOf(gout, gn));
      }""")
  override protected def withNewChildInternal(c: Expression): CdcChunks = copy(child = c)
}
