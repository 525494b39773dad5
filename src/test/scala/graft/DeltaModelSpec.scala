package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Delta

/** Model-based test of the Delta log: a seeded random sequence of
  * append / overwrite / compact / checkpoint / txn-append operations is
  * applied to both the real table and a trivial in-memory model; after
  * every step the snapshot read must match the model exactly (count +
  * id-sum), and at the end every historical version must still
  * time-travel to its recorded state. This is the strongest guard on the
  * replay logic — individual example tests can't cover action
  * interleavings like overwrite-after-checkpoint-after-compact. */
class DeltaModelSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def df(ids: Seq[Long]) =
    ids.map(i => (i, s"row_$i", (i % 3).toString)).toDF("id", "name", "g")

  test("random op sequences replay to the model state at every version") {
    val rnd = new scala.util.Random(20260812L)
    val path = "/tmp/graft_delta_model"
    Delta.deleteTable(path)

    var model = Vector.empty[Long]              // current logical row ids
    var history = Map.empty[Long, Vector[Long]] // data version -> ids
    var nextId = 0L
    def freshIds(n: Int): Seq[Long] = { val r = nextId until nextId + n; nextId += n; r }

    def check(tag: String): Unit = {
      val got = Delta.read(spark, path)
      assert(got.count() == model.size, s"$tag: count mismatch")
      val gotSum = if (model.isEmpty) 0L
        else got.agg(coalesce(sum("id"), lit(0L))).head().getLong(0)
      assert(gotSum == model.sum, s"$tag: id-sum mismatch")
      // stats-pruned read sees exactly the model subset, at any threshold
      val t = if (model.isEmpty) 1L else model(rnd.nextInt(model.size))
      val pruned = Delta.read(spark, path, dataFilter = Some(col("id") < t)).count()
      assert(pruned == model.count(_ < t), s"$tag: stats-pruned count mismatch at id<$t")
    }

    // v0 must exist before compact/checkpoint make sense
    val first = freshIds(5)
    val v0 = Delta.write(df(first), path, partitionBy = Seq("g"))
    model = first.toVector; history += v0 -> model
    check("v0")

    (1 to 25).foreach { step =>
      rnd.nextInt(6) match {
        case 0 | 1 => // append
          val ids = freshIds(1 + rnd.nextInt(8))
          val v = Delta.write(df(ids), path)
          model = model ++ ids; history += v -> model
        case 2 => // overwrite
          val ids = freshIds(rnd.nextInt(6)) // possibly empty
          val v = Delta.write(df(ids), path, mode = "overwrite")
          model = ids.toVector; history += v -> model
        case 3 => // compact (no logical change; new version, same data)
          val v = Delta.compact(spark, path)
          history += v -> model
        case 4 => // checkpoint, sometimes followed by a txn-stamped append
          Delta.checkpoint(spark, path)
          if (rnd.nextBoolean()) {
            val ids = freshIds(3)
            val v = Delta.write(df(ids), path, txn = Some("model-app" -> step.toLong))
            model = model ++ ids; history += v -> model
          }
        case 5 => // zorder rewrite (no logical change; new version, same data)
          val v = Delta.optimizeZorder(spark, path, Seq("id"))
          history += v -> model
      }
      check(s"step $step")
    }

    // every recorded version still time-travels to its state
    history.foreach { case (v, ids) =>
      val got = Delta.read(spark, path, versionAsOf = Some(v))
      assert(got.count() == ids.size, s"time travel to v$v: count")
      val gotSum = if (ids.isEmpty) 0L
        else got.agg(coalesce(sum("id"), lit(0L))).head().getLong(0)
      assert(gotSum == ids.sum, s"time travel to v$v: id-sum")
    }
    // and the txn watermark reflects the LAST txn-stamped step
    val snap = Delta.snapshot(spark, path)
    snap.appTxns.get("model-app").foreach(v => assert(v >= 1L && v <= 25L))
  }
}
