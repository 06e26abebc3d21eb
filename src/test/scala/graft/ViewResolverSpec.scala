package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.engine.{Registry, ViewResolver}

/** View-derivation DAG resolution (reference FeatureResolver,
  * infra/compute_engines/feature_resolver.py:40-80: recursive walk with
  * path-based cycle detection + node cache, topological order).
  */
class ViewResolverSpec extends SparkTestBase {
  import spark.implicits._

  private def baseView(name: String, df: DataFrame): FeatureView =
    FeatureView(name, df, Seq("k"), "ts")

  private val src = Seq(
    ("a", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1L),
    ("a", java.sql.Timestamp.valueOf("2024-01-02 00:00:00"), 2L),
    ("b", java.sql.Timestamp.valueOf("2024-01-01 12:00:00"), 5L)
  ).toDF("k", "ts", "v")

  test("chain derivation composes one lazy plan, upstream evaluated once") {
    val calls = new AtomicInteger(0)
    val base = Map("leaf" -> baseView("leaf", src))
    val derived = Map(
      "mid" -> DerivedViewSpec("mid", Seq("leaf"),
        srcs => { calls.incrementAndGet(); srcs.head.withColumn("v2", col("v") * 2) },
        Seq("k"), "ts"),
      "top" -> DerivedViewSpec("top", Seq("mid"),
        srcs => srcs.head.filter(col("v2") > 2),
        Seq("k"), "ts", features = Seq("v", "v2")))
    val view = ViewResolver.resolve("top", base.get, derived.get)
    assert(view.name == "top" && view.resolvedFeatures == Seq("v", "v2"))
    assert(calls.get() == 1) // derive ran once, at resolution time
    val rows = view.source.orderBy("k", "ts").collect()
    assert(rows.map(_.getAs[Long]("v2")).toSeq == Seq(4L, 10L))
  }

  test("diamond dependency resolves the shared upstream exactly once") {
    val leafCalls = new AtomicInteger(0)
    val base = Map("raw" -> baseView("raw", src))
    val derived = Map(
      "shared" -> DerivedViewSpec("shared", Seq("raw"),
        srcs => { leafCalls.incrementAndGet(); srcs.head.withColumn("s", col("v") + 1) },
        Seq("k"), "ts"),
      "l" -> DerivedViewSpec("l", Seq("shared"),
        srcs => srcs.head.withColumn("lft", col("s") * 10), Seq("k"), "ts"),
      "r" -> DerivedViewSpec("r", Seq("shared"),
        srcs => srcs.head.withColumn("rgt", col("s") * 100), Seq("k"), "ts"),
      "join" -> DerivedViewSpec("join", Seq("l", "r"),
        srcs => srcs(0).join(srcs(1).select(col("k").as("k2"), col("rgt")),
          col("k") === col("k2")).drop("k2"),
        Seq("k"), "ts"))
    val view = ViewResolver.resolve("join", base.get, derived.get)
    assert(leafCalls.get() == 1) // node cache: diamond shares one instance
    assert(view.source.columns.contains("lft") && view.source.columns.contains("rgt"))
    assert(view.source.count() == 5) // key a: 2x2 pairs, key b: 1x1
  }

  test("cycle is detected with the full path") {
    val derived = Map(
      "x" -> DerivedViewSpec("x", Seq("y"), srcs => srcs.head, Seq("k"), "ts"),
      "y" -> DerivedViewSpec("y", Seq("x"), srcs => srcs.head, Seq("k"), "ts"))
    val e = intercept[ViewResolver.CycleException] {
      ViewResolver.resolve("x", _ => None, derived.get)
    }
    assert(e.path == Seq("x", "y", "x"))
  }

  test("unknown source view names the referrer") {
    val derived = Map(
      "d" -> DerivedViewSpec("d", Seq("ghost"), srcs => srcs.head, Seq("k"), "ts"))
    val e = intercept[ViewResolver.UnknownViewException] {
      ViewResolver.resolve("d", _ => None, derived.get)
    }
    assert(e.getMessage.contains("ghost") && e.getMessage.contains("'d'"))
  }

  test("topoOrder lists upstream-first, each node once") {
    val derived = Map(
      "b" -> DerivedViewSpec("b", Seq("a"), srcs => srcs.head, Seq("k"), "ts"),
      "c" -> DerivedViewSpec("c", Seq("a"), srcs => srcs.head, Seq("k"), "ts"),
      "d" -> DerivedViewSpec("d", Seq("b", "c"), srcs => srcs.head, Seq("k"), "ts"))
    val order = ViewResolver.topoOrder("d", derived.get)
    assert(order.last == "d")
    assert(order.indexOf("a") < order.indexOf("b"))
    assert(order.indexOf("a") < order.indexOf("c"))
    assert(order.distinct == order)
  }

  test("registry resolves derived refs end-to-end through PIT retrieval") {
    val entity = Seq(
      ("a", java.sql.Timestamp.valueOf("2024-01-03 00:00:00")),
      ("b", java.sql.Timestamp.valueOf("2024-01-02 00:00:00"))
    ).toDF("k", "event_ts")
    val reg = new Registry()
      .register(baseView("raw", src))
      .register(DerivedViewSpec("doubled", Seq("raw"),
        srcs => srcs.head.withColumn("v2", col("v") * 2),
        Seq("k"), "ts", features = Seq("v2")))
    val out = reg.getHistoricalFeatures(entity, Seq("doubled:v2"))
      .orderBy("k").collect()
    assert(out.map(r => (r.getAs[String]("k"), r.getAs[Long]("v2"))).toSeq ==
      Seq(("a", 4L), ("b", 10L)))
  }
}
