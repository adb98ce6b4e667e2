package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.catalyst._

/** SparkSessionExtensions entry point: registers graft's native
  * expressions as SQL functions in every session built with
  *   .withExtensions(new GraftExtensions)
  * or spark.sql.extensions=graft.GraftExtensions — making them usable
  * from pure SQL (including inside lambda HOFs) cluster-wide without
  * touching the session's function registry by hand.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, name, usage, "", "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("graft_poly_hash"),
      info("graft_poly_hash", "graft_poly_hash(str) - rolling polynomial hash"),
      (es: Seq[Expression]) => PolyHash(es.head, 31, GraftHash.FP)))
    ext.injectFunction((FunctionIdentifier("graft_simhash60"),
      info("graft_simhash60", "graft_simhash60(tokens) - 60-bit simhash"),
      (es: Seq[Expression]) => SimHash60(es.head)))
    ext.injectFunction((FunctionIdentifier("graft_cosine"),
      info("graft_cosine", "graft_cosine(a, b) - cosine similarity of float vectors"),
      (es: Seq[Expression]) => CosineSim(es.head, es(1))))
    ext.injectFunction((FunctionIdentifier("graft_minhash"),
      info("graft_minhash", "graft_minhash(set, k) - k-minhash signature"),
      (es: Seq[Expression]) => {
        val k = es(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Number, _) =>
            v.intValue()
          case other => throw new IllegalArgumentException(
            s"graft_minhash: k must be an integer literal, got $other")
        }
        MinHashSig(es.head, k)
      }))
    // sketch aggregates: bare AggregateFunctions — the analyzer wraps
    // them in AggregateExpression(Complete) on resolution
    ext.injectFunction((FunctionIdentifier("graft_freq_sketch"),
      info("graft_freq_sketch", "graft_freq_sketch(col, maxMapSize) - frequent-items sketch"),
      (es: Seq[Expression]) => FreqSketchAgg(es.head, intLit(es(1), "maxMapSize"))))
    ext.injectFunction((FunctionIdentifier("graft_freq_merge"),
      info("graft_freq_merge", "graft_freq_merge(sketch, maxMapSize) - union freq sketches"),
      (es: Seq[Expression]) => FreqSketchMerge(es.head, intLit(es(1), "maxMapSize"))))
    ext.injectFunction((FunctionIdentifier("graft_freq_topk"),
      info("graft_freq_topk", "graft_freq_topk(sketch, k) - top-k (item, est) from a freq sketch"),
      (es: Seq[Expression]) => FreqSketchTopK(es.head, intLit(es(1), "k"))))
    ext.injectFunction((FunctionIdentifier("graft_kll_sketch"),
      info("graft_kll_sketch", "graft_kll_sketch(col, k) - KLL quantile sketch"),
      (es: Seq[Expression]) => KllSketchAgg(es.head, intLit(es(1), "k"))))
    ext.injectFunction((FunctionIdentifier("graft_kll_merge"),
      info("graft_kll_merge", "graft_kll_merge(sketch, k) - union KLL sketches"),
      (es: Seq[Expression]) => KllSketchMerge(es.head, intLit(es(1), "k"))))
  }

  private def intLit(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Number, _) => v.intValue()
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }
}
