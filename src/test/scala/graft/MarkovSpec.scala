package graft

import org.apache.spark.sql.functions._
import graft.operators.Markov

/** Property contract of the shared fixed-point iteration (q119 /
  * stationaryFrom both delegate here): on arbitrary kernels —
  * including sources, sinks and disconnected states — the integer
  * rounds match a plain in-memory fold of the committed rule exactly,
  * and truncation only ever LEAKS mass.
  */
class MarkovSpec extends SparkSpec {

  test("property: stationaryRanks equals the in-memory integer fold; mass never grows") {
    import spark.implicits._
    import org.scalacheck.{Gen, Prop}
    val kernelGen = Gen.nonEmptyListOf(for {
      s <- Gen.choose(0, 4); t <- Gen.choose(0, 5) // t=5 = sink-only
      c <- Gen.choose(1L, 9L)
    } yield (s"n$s", s"n$t", c)).map(_.take(12))
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(8),
      Prop.forAll(kernelGen) { raw =>
        val pairs = raw.groupBy(e => (e._1, e._2)).toSeq
          .map { case ((s, t), es) => (s, t, es.map(_._3).sum) }
        val ctot = pairs.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
        val trans = pairs.map { case (s, t, c) => (s, t, c, ctot(s)) }
          .toDF("src", "dst", "c", "ctot")
        val got = Markov.stationaryRanks(trans, rounds = 3).collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
        // in-memory fold of the committed rule
        val states = (pairs.map(_._1) ++ pairs.map(_._2)).distinct
        var rank = states.map(_ -> 1000000L).toMap
        (1 to 3).foreach { _ =>
          rank = states.map { t =>
            t -> pairs.filter(_._2 == t)
              .map { case (s, _, c) => (rank(s) * c) / ctot(s) }
              .sum
          }.toMap
        }
        val mass = got.values.sum
        got == rank && mass >= 0L && mass <= states.length * 1000000L
      })
    assert(res.passed, res.status.toString)
    GraftSession.release(spark)
  }
}
