package graft.core

/** J1–J3: the greedy scored fuzzy merge of regex items with a second item
  * source, ported from
  * /root/reference/extractor/services/extraction_service.py:318-447.
  *
  * In the reference the second source is an LLM parser; offline (no API
  * key) the factory returns None and the strategy skips the merge
  * (extraction_service.py:86-120,618-651) — our pipeline mirrors that
  * default. The merge operators themselves are ported and tested against a
  * deterministic fake source because their semantics are part of the
  * operator inventory (SURVEY.md §2.5):
  *
  *  - J1 `findBestMatch` — greedy scored assignment with consumption:
  *    fixture equality +10 / containment +5, model equality +8 /
  *    containment +4, page equality +3; best score ≥3 wins and the item is
  *    consumed. Order-dependent by design (left order = regex item order).
  *  - J2 `mergeItemData` — field-wise enrichment: take the enhancement when
  *    the base is Python-falsy; when both present keep whichever `str()`
  *    is LONGER (ties go to the enhancement — `len(str(base)) >
  *    len(str(enh))` keeps base only strictly); lineage fields preserved.
  *  - J3 residue — unconsumed second-source items are appended iff they
  *    carry a page_number or fixture_type.
  */
object LlmMerge {

  private def truthyS(v: Option[String]): Boolean = v.exists(_.nonEmpty)
  private def truthyQ(v: Option[Qty]): Boolean = v.exists(_.truthy)
  private def sLen(v: Option[String]): Int = v.fold(0)(_.length)
  private def qLen(v: Option[Qty]): Int = v.fold(0)(_.pyStr.length)

  /** J1 (extraction_service.py:360-411): index of the best unconsumed
    * match, or None when the best score < 3.
    */
  def findBestMatch(regexItem: RawItem, llmItems: IndexedSeq[RawItem],
                    used: collection.Set[Int]): Option[Int] = {
    val rFixture = regexItem.fixtureType.getOrElse("").toLowerCase
    val rModel = regexItem.modelNumber.getOrElse("").toLowerCase
    val rPage = regexItem.pageNumber
    var bestScore = 0
    var bestIdx = -1
    var idx = 0
    while (idx < llmItems.length) {
      if (!used.contains(idx)) {
        val li = llmItems(idx)
        val lFixture = li.fixtureType.getOrElse("").toLowerCase
        val lModel = li.modelNumber.getOrElse("").toLowerCase
        var score = 0
        if (rFixture.nonEmpty && lFixture.nonEmpty) {
          if (rFixture == lFixture) score += 10
          else if (lFixture.contains(rFixture) || rFixture.contains(lFixture)) score += 5
        }
        if (rModel.nonEmpty && lModel.nonEmpty) {
          if (rModel == lModel) score += 8
          else if (lModel.contains(rModel) || rModel.contains(lModel)) score += 4
        }
        if (rPage != 0 && li.pageNumber != 0 && rPage == li.pageNumber) score += 3
        if (score > bestScore) { bestScore = score; bestIdx = idx }
      }
      idx += 1
    }
    if (bestScore >= 3) Some(bestIdx) else None
  }

  /** J2 (extraction_service.py:413-447): field-wise merge; lineage
    * (page/table/row/line/raw_text) always kept from the base.
    */
  def mergeItemData(base: RawItem, enh: RawItem): RawItem = {
    def mergeS(b: Option[String], e: Option[String]): Option[String] =
      if (!truthyS(b) && truthyS(e)) e
      else if (truthyS(b) && truthyS(e)) { if (sLen(b) > sLen(e)) b else e }
      else b
    def mergeQ(b: Option[Qty], e: Option[Qty]): Option[Qty] =
      if (!truthyQ(b) && truthyQ(e)) e
      else if (truthyQ(b) && truthyQ(e)) { if (qLen(b) > qLen(e)) b else e }
      else b
    base.copy(
      fixtureType = mergeS(base.fixtureType, enh.fixtureType),
      quantity = mergeQ(base.quantity, enh.quantity),
      modelNumber = mergeS(base.modelNumber, enh.modelNumber),
      dimensions = mergeS(base.dimensions, enh.dimensions),
      mountingType = mergeS(base.mountingType, enh.mountingType),
      specReference = mergeS(base.specReference, enh.specReference))
  }

  /** J1+J2+J3 (extraction_service.py:318-358): greedy left-order merge with
    * consumption, then the unconsumed residue (needs page or fixture).
    */
  def mergeRegexAndLlmItems(regexItems: Seq[RawItem],
                            llmItems: IndexedSeq[RawItem]): Vector[RawItem] = {
    val used = collection.mutable.Set.empty[Int]
    val merged = Vector.newBuilder[RawItem]
    regexItems.foreach { ri =>
      findBestMatch(ri, llmItems, used) match {
        case Some(i) => used += i; merged += mergeItemData(ri, llmItems(i))
        case None    => merged += ri
      }
    }
    llmItems.zipWithIndex.foreach { case (li, i) =>
      if (!used.contains(i) && (li.pageNumber != 0 || li.fixtureType.exists(_.nonEmpty)))
        merged += li
    }
    merged.result()
  }

  /** A6 (extraction_service.py:296-316): did the merge actually add or
    * enrich anything? Field count = non-null, non-empty-string values.
    */
  def llmActuallyWorked(regexItems: Seq[RawItem], merged: Seq[RawItem]): Boolean = {
    if (merged.length != regexItems.length) return true
    // reference counts `v is not None and v != ''` — so int 0 counts but
    // an empty-string quantity does not
    def qCount(v: Option[Qty]): Int =
      v.count { case QStr("") => false; case _ => true }
    def truthyCount(v: Option[String]): Int = if (v.exists(_ != "")) 1 else 0
    def fields(it: RawItem): Int =
      Seq(truthyCount(it.fixtureType), qCount(it.quantity),
        truthyCount(it.modelNumber), truthyCount(it.dimensions),
        truthyCount(it.mountingType), truthyCount(it.specReference)).sum
    merged.zip(regexItems).exists { case (m, o) => fields(m) > fields(o) }
  }
}
