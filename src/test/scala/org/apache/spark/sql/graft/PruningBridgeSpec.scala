package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{AttributeReference, In, InSet, Literal}
import org.apache.spark.sql.types.{Decimal, DecimalType, LongType}
import org.scalatest.funsuite.AnyFunSuite

/** Unit pins on the filter→skipping extraction: a value the
  * comparable domain cannot hold (Catalyst Decimal, binary) must void
  * the WHOLE any-of entry — a silently-reduced value set would prune
  * files that contain exactly the dropped values. */
class PruningBridgeSpec extends AnyFunSuite {

  private val decAttr = AttributeReference("d", DecimalType(10, 2))()
  private val longAttr = AttributeReference("k", LongType)()

  test("one unconvertible IN literal voids the whole entry") {
    val decIn = In(decAttr, Seq(Literal(Decimal("150.50"))))
    assert(PruningBridge.inSetsOf(Seq(decIn)).isEmpty)
  }

  test("a mixed InSet with one unconvertible value voids the entry; " +
    "an all-convertible one survives untouched") {
    val mixed = InSet(decAttr, Set[Any](Decimal("150.50"), 7L))
    assert(PruningBridge.inSetsOf(Seq(mixed)).isEmpty)
    val ok = PruningBridge.inSetsOf(
      Seq(In(longAttr, Seq(Literal(1L), Literal(2L)))))
    assert(ok.map { case (c, vs) => (c, vs.toSet) } ==
      Seq("k" -> Set[Any](1L, 2L)))
  }

  test("nulls in the list still contribute nothing without voiding " +
    "the entry (IN never matches null); an all-null list emits no " +
    "entry at all") {
    val withNull = In(longAttr,
      Seq(Literal(1L), Literal(null, LongType)))
    assert(PruningBridge.inSetsOf(Seq(withNull))
      .map { case (c, vs) => (c, vs.toSet) } ==
      Seq("k" -> Set[Any](1L)))
    val allNull = In(longAttr, Seq(Literal(null, LongType)))
    assert(PruningBridge.inSetsOf(Seq(allNull)).isEmpty)
  }
}
