package graft

/** Pins the between-query storage sweep (GraftSession.release) that the
  * round-6 bench win came from: localCheckpoint blocks created inside
  * iterative operators (the dedup CC loop, q70's cached edge relation)
  * are RDD storage `spark.catalog.clearCache()` never touches, and left
  * unreleased they accumulate old-gen pressure suite-wide. If a future
  * refactor drops the getPersistentRDDs sweep, this is the spec that
  * fails.
  */
class ReleaseSpec extends SparkSpec {

  test("release() drops checkpoint RDD blocks that clearCache alone leaves behind") {
    // two checkpoint-heavy queries, exactly as Bench runs them
    SparkEntry.queries("dedup_clusters")(spark, sf).count()
    SparkEntry.queries("q70_recursive_cte")(spark, sf).count()
    // precondition: the queries really do leave persistent RDD storage
    // behind (otherwise this spec would pass vacuously forever)
    assert(spark.sparkContext.getPersistentRDDs.nonEmpty,
      "expected checkpoint-heavy queries to leave persistent RDDs; " +
        "pick different queries if their implementation changed")
    GraftSession.release(spark)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "GraftSession.release must unpersist ALL persistent RDDs " +
        "(catalog cache + localCheckpoint blocks)")
    assert(spark.catalog.listTables().filter("isTemporary").count() >= 0) // session still usable
  }
}
