package graft.cdc

import graft.SparkSpec
import scala.util.Random

/** Seeded randomized invariants for SCD2 (the PropertySpec style):
  * on ARBITRARY in-order change streams the built dimension must
  * (a) partition each key's lifetime into non-overlapping, chained
  * half-open intervals per insert-epoch, (b) carry exactly one open
  * version per live key and none for deleted keys, (c) equal the
  * merge-fold over ANY random in-order batch split, and (d) as-of
  * reads at every event time must equal the brute-force replay. */
class Scd2PropertySpec extends SparkSpec {
  import spark.implicits._

  private val K = Seq("id")
  private val V = Seq("id", "v")

  /** Random per-key event chains: c (u|c)* d? (re-insert cycles allowed),
    * strictly increasing ts per key, globally unique offsets. */
  private def randomEvents(seed: Int): Seq[(Int, String, String, Long, Long)] = {
    val rnd = new Random(seed)
    var off = 0L
    (1 to 12).flatMap { key =>
      var ts = rnd.nextInt(10).toLong
      var alive = false
      (0 until rnd.nextInt(8)).flatMap { i =>
        ts += 1 + rnd.nextInt(5)
        off += 1
        val op =
          if (!alive) { alive = true; "c" }
          else if (rnd.nextInt(4) == 0) { alive = false; "d" }
          else "u"
        Seq((key, s"v$key-$i", op, ts, off))
      }
    }
  }

  private def build(rows: Seq[(Int, String, String, Long, Long)]) =
    Scd2.build(rows.toDF("id", "v", "op", "ts", "off"), K, "ts",
      Seq("off"), V)
      .select("id", "v", "valid_from_ms", "valid_to_ms", "is_current")
      .as[(Int, String, Long, Option[Long], Boolean)].collect().toSeq

  test("interval chaining, tombstone, and open-version invariants " +
    "hold on random streams") {
    for (seed <- Seq(7, 131, 977)) {
      val events = randomEvents(seed)
      val dim = build(events)
      dim.groupBy(_._1).foreach { case (key, vs) =>
        val sorted = vs.sortBy(_._3)
        // intervals chain: each valid_to equals the next valid_from,
        // except across delete gaps, where it may close earlier
        sorted.sliding(2).foreach {
          case Seq(a, b) =>
            assert(a._4.isDefined, s"seed=$seed key=$key: non-final " +
              "version must be closed")
            assert(a._4.get <= b._3, s"seed=$seed key=$key: overlap")
          case _ => ()
        }
        // at most one open version, and it must be the last
        val open = vs.filter(_._4.isEmpty)
        assert(open.size <= 1)
        assert(open.forall(_ == sorted.last))
        assert(vs.count(_._5) == open.size,
          s"seed=$seed key=$key: is_current <=> open interval")
        // the key is live iff its LAST event is not a delete
        val lastOp = events.filter(_._1 == key).maxBy(_._5)._3
        assert(open.nonEmpty == (lastOp != "d"),
          s"seed=$seed key=$key: open iff last op non-delete")
      }
    }
  }

  test("merge-fold over random in-order splits equals the build, and " +
    "as-of reads equal the brute-force replay") {
    for (seed <- Seq(23, 419)) {
      val events = randomEvents(seed)
      val df = events.toDF("id", "v", "op", "ts", "off")
      val oneShot = build(events).toSet
      val rnd = new Random(seed * 31)
      // random split of the offset range into 1..5 in-order batches
      val cuts = (0 until rnd.nextInt(5))
        .map(_ => rnd.nextLong(events.size.toLong + 1)).sorted
      val bounds = (Long.MinValue +: cuts :+ Long.MaxValue).sliding(2)
      val folded = bounds.foldLeft(
        Scd2.build(df.limit(0), K, "ts", Seq("off"), V)) {
        case (dim, Seq(lo, hi)) =>
          Scd2.merge(dim, df.filter($"off" > lo && $"off" <= hi),
            K, "ts", Seq("off"), V)
      }
      assert(folded
        .select("id", "v", "valid_from_ms", "valid_to_ms", "is_current")
        .as[(Int, String, Long, Option[Long], Boolean)].collect().toSet
        == oneShot, s"seed=$seed splits=$cuts")

      // as-of at every distinct event ts == brute-force replay state
      val dim = build(events)
      for (t <- events.map(_._4).distinct.sorted) {
        val asOf = dim.filter(r => r._3 <= t &&
          r._4.forall(_ > t)).map(v => (v._1, v._2)).toSet
        val replay = events.filter(_._4 <= t).groupBy(_._1).flatMap {
          case (key, evs) =>
            val last = evs.maxBy(e => (e._4, e._5))
            if (last._3 == "d") None else Some((key, last._2))
        }.toSet
        assert(asOf == replay, s"seed=$seed t=$t")
      }
    }
  }
}
