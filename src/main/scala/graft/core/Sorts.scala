package graft.core

import java.util.Comparator

/** Allocation-free comparators for the per-turn hot path.
  *
  * Scala's `seq.sortBy(f)` evaluates `f` on EVERY comparison
  * (`sorted(ord on f)`), so tuple/boxed keys allocate O(n log n)
  * objects per sort — measured as the dominant GC churn at 32 threads
  * (several sorts per turn × ~10⁶ turns). These comparators compare
  * fields directly; java.util.Arrays.sort (TimSort) is stable, same as
  * the sortBy it replaces. */
object Sorts {

  val spanReadingOrder: Comparator[Span] = new Comparator[Span] {
    def compare(a: Span, b: Span): Int = {
      if (a.page != b.page) return Integer.compare(a.page, b.page)
      if (a.y1 != b.y1) return Integer.compare(a.y1, b.y1)
      Integer.compare(a.x1, b.x1)
    }
  }

  val spanByYX: Comparator[Span] = new Comparator[Span] {
    def compare(a: Span, b: Span): Int = {
      if (a.y1 != b.y1) return Integer.compare(a.y1, b.y1)
      Integer.compare(a.x1, b.x1)
    }
  }

  val spanByX1: Comparator[Span] = new Comparator[Span] {
    def compare(a: Span, b: Span): Int = Integer.compare(a.x1, b.x1)
  }

  val cellByYCenter: Comparator[Cell] = new Comparator[Cell] {
    def compare(a: Cell, b: Cell): Int =
      java.lang.Double.compare(a.y1 + a.y2, b.y1 + b.y2)
  }

  val cellByXCenter: Comparator[Cell] = new Comparator[Cell] {
    def compare(a: Cell, b: Cell): Int =
      java.lang.Double.compare(a.x1 + a.x2, b.x1 + b.x2)
  }

  /** Stable sort of an IndexedSeq via a scratch array. */
  def sorted[T <: AnyRef](xs: scala.collection.IndexedSeq[T], cmp: Comparator[T])(
      implicit ct: scala.reflect.ClassTag[T]): Array[T] = {
    val arr = new Array[T](xs.length)
    var i = 0
    while (i < xs.length) { arr(i) = xs(i); i += 1 }
    java.util.Arrays.sort(arr, cmp)
    arr
  }
}
