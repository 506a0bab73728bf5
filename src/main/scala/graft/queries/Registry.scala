package graft.queries

/** Duplicate-safe construction for the t2 query/oracle registries.
  *
  * Scala `Map(...)` literals silently keep the LAST entry for a repeated
  * key, so a query accidentally registered twice in the same file shadows
  * the earlier (possibly more scalable) implementation with no compile or
  * runtime signal — and when the stale pair is self-consistent the oracle
  * compare stays green, hiding the defect from the correctness gate too
  * (this happened to `pk1_sequence_packing` in rounds 6–11). Building each
  * registry through [[uniqueMap]] turns an intra-registry duplicate into a
  * hard failure at first access; InvariantsSpec pins the behavior and the
  * cross-registry check covers the `++` merge layer above.
  */
object Registry {

  /** Like `Map(entries: _*)` but fails loudly on a duplicated key. */
  def uniqueMap[V](label: String)(entries: (String, V)*): Map[String, V] = {
    val dups = entries.groupBy(_._1).collect { case (k, vs) if vs.size > 1 => k }
    require(dups.isEmpty,
      s"$label: duplicate registry keys would silently shadow: ${dups.toSeq.sorted.mkString(", ")}")
    entries.toMap
  }
}
