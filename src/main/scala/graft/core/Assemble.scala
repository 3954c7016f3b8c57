package graft.core

import graft.json.{Canonical, J}

/** One page of a document — the reference's pages_data element
  * (/root/reference/extractor/extractors/pdf_text_extractor.py:200-206).
  * `tables` is the pdfplumber 3-level nesting with nullable cells.
  */
final case class PageData(
    pageNum: Long,
    text: String,
    width: Option[Double],
    height: Option[Double],
    tables: Seq[Seq[Seq[Option[String]]]]
)

/** Strategy-layer assembly, ported from
  * /root/reference/extractor/services/extraction_service.py
  * (construction :57-151,176-214 / standard :468-512) and the Pydantic
  * validators in /root/reference/extractor/models/. Produces the canonical
  * per-document JSON byte-identically to the reference's
  * `json.dump(result, indent=2, ensure_ascii=False)`.
  */
object Assemble {

  /** Pydantic ExtractedItem validators (models/construction.py:62-102):
    * fixture/dimensions strip; quantity int-or-string coercion; model
    * strip().upper().
    */
  def validateItem(it: RawItem): RawItem = {
    val fixture = it.fixtureType.map(v => if (v.nonEmpty) PyStr.strip(v) else v)
    val qty = it.quantity.map {
      case QInt(v) => QInt(v)
      case QStr(s0) =>
        val s = PyStr.strip(s0)
        if (s.contains('.') || s.contains(',')) QStr(s)
        else
          try QInt(PyInt.parse(s))
          catch { case _: NumberFormatException => QStr(s) }
    }
    val model = it.modelNumber.map(v => if (v.nonEmpty) PyStr.upper(PyStr.strip(v)) else v)
    val dims = it.dimensions.map(v => if (v.nonEmpty) PyStr.strip(v) else v)
    it.copy(fixtureType = fixture, quantity = qty, modelNumber = model, dimensions = dims)
  }

  /** get_statistics (helpers.py:67-86). Character/word counts use Python
    * `len(str)` (code points) and `str.split()` (whitespace runs).
    */
  def statisticsJson(pages: Seq[PageData]): J = {
    val totalChars = pages.map(p => PyStr.len(p.text).toLong).sum
    val totalWords = pages.map(p => PyStr.countWords(p.text)).sum
    val n = pages.length
    J.obj(
      "total_pages" -> J.I(n.toLong),
      "total_characters" -> J.I(totalChars),
      "total_words" -> J.I(totalWords),
      "avg_chars_per_page" -> J.F(if (n > 0) totalChars.toDouble / n else 0.0),
      "avg_words_per_page" -> J.F(if (n > 0) totalWords.toDouble / n else 0.0)
    )
  }

  private def qtyJson(q: Option[Qty]): J = q match {
    case None          => J.Null
    case Some(QInt(v)) => J.I(v)
    case Some(QStr(s)) => J.S(s)
  }

  /** ExtractedItem.model_dump(mode='json') field order
    * (models/construction.py:10-60).
    */
  def itemJson(it: RawItem): J = J.obj(
    "fixture_type" -> J.optS(it.fixtureType),
    "quantity" -> qtyJson(it.quantity),
    "model_number" -> J.optS(it.modelNumber),
    "dimensions" -> J.optS(it.dimensions),
    "mounting_type" -> J.optS(it.mountingType),
    "spec_reference" -> J.optS(it.specReference),
    "page_number" -> J.I(it.pageNumber),
    "table_number" -> J.optI(it.tableNumber),
    "row_number" -> J.optI(it.rowNumber),
    "raw_text" -> J.optS(it.rawText),
    "line_number" -> J.optI(it.lineNumber)
  )

  /** ConstructionExtractionStrategy.extract (extraction_service.py:57-151)
    * minus progress printing and the LLM branch (disabled ≙ no API key,
    * main.py:96-111). Returns the output dict as canonical J (source_pdf
    * and the _llm_* flags already popped, extraction_service.py:143-149 +
    * main.py:131-134).
    */
  def constructionResult(pages: Seq[PageData], llm: Option[LlmParser] = None): J = {
    val allItems = scala.collection.mutable.ArrayBuffer.empty[RawItem]
    var tablesFound = 0L
    pages.foreach { p =>
      allItems ++= Construction.extractItems(p.text, p.pageNum)
      if (p.tables.nonEmpty) {
        allItems ++= Construction.parseTables(p.tables, p.pageNum)
        tablesFound += p.tables.length
      }
    }
    // _enhance_with_llm (extraction_service.py:225-316): second source runs
    // on the raw items BEFORE validation; failures / empty results / merges
    // that change nothing all fall back to the regex-only items.
    val finalItems: Vector[RawItem] = llm match {
      case Some(parser) =>
        val regexItems = allItems.toVector
        try {
          val textForLlm = PyStr.sliceTo(combinePagesText(pages), 16000) // F19
          val llmItems = parser.parseItems(textForLlm).toIndexedSeq
          if (llmItems.isEmpty) regexItems
          else {
            val merged = LlmMerge.mergeRegexAndLlmItems(regexItems, llmItems)
            if (LlmMerge.llmActuallyWorked(regexItems, merged)) merged else regexItems
          }
        } catch { case _: Exception => regexItems }
      case None => allItems.toVector
    }
    val validated = finalItems.map(validateItem)

    // _create_summary (extraction_service.py:176-191): quantity counts use
    // `is not None`; model/dimensions/mounting use truthiness.
    val summary = J.obj(
      "total_items" -> J.I(validated.length.toLong),
      "items_with_quantities" -> J.I(validated.count(_.quantity.isDefined).toLong),
      "items_with_model_numbers" -> J.I(validated.count(_.modelNumber.exists(_.nonEmpty)).toLong),
      "items_with_dimensions" -> J.I(validated.count(_.dimensions.exists(_.nonEmpty)).toLong),
      "items_with_mounting_type" -> J.I(validated.count(_.mountingType.exists(_.nonEmpty)).toLong),
      "pages_processed" -> J.I(pages.length.toLong),
      "tables_found" -> J.I(tablesFound)
    )

    // _create_page_infos (extraction_service.py:193-214)
    val pageInfos = pages.map { p =>
      val preview0 = p.text
      val preview =
        if (PyStr.len(preview0) > 200) PyStr.sliceTo(preview0, 200) + "..." else preview0
      J.obj(
        "page_num" -> J.I(p.pageNum),
        "text_preview" -> (if (preview.nonEmpty) J.S(preview) else J.Null),
        "has_tables" -> J.B(p.tables.nonEmpty)
      )
    }

    J.obj(
      "extraction_mode" -> J.S("construction_takeoff"),
      "statistics" -> statisticsJson(pages),
      "total_items_found" -> J.I(validated.length.toLong),
      "items" -> J.arr(validated.map(itemJson)),
      "summary" -> summary,
      "pages" -> J.arr(pageInfos)
    )
  }

  /** combine_pages_text (helpers.py:53-64). */
  def combinePagesText(pages: Seq[PageData]): String = pages.map(_.text).mkString("\n\n")

  /** StandardExtractionStrategy.extract (extraction_service.py:468-512). */
  def standardResult(pages: Seq[PageData], tablesWereNull: Long => Boolean = _ => false): J = {
    val fullText = combinePagesText(pages)
    val entities = Entities.extractEntities(fullText).toMap

    // PageData.model_dump — normalize_table_cells keeps None tables as null
    // (helpers.py:89-118); our pages carry [] when absent, which dumps as [].
    val pageJs = pages.map { p =>
      val tablesJ: J =
        if (tablesWereNull(p.pageNum)) J.Null
        else
          J.arr(p.tables.map(t =>
            J.arr(t.map(row => J.arr(row.map(c => J.optS(c)))))))
      J.obj(
        "page_num" -> J.I(p.pageNum),
        "text" -> J.S(p.text),
        "width" -> p.width.fold[J](J.Null)(J.F.apply),
        "height" -> p.height.fold[J](J.Null)(J.F.apply),
        "tables" -> tablesJ
      )
    }

    val entitiesJ = J.O(
      Vector("email", "phone", "date", "currency", "url", "ssn").map { k =>
        k -> J.arr(entities.getOrElse(k, Nil).map(J.S.apply))
      }
    )

    J.obj(
      "extraction_mode" -> J.S("standard"),
      "statistics" -> statisticsJson(pages),
      "pages" -> J.arr(pageJs),
      "full_text" -> J.S(fullText),
      "entities" -> entitiesJ
    )
  }

  /** The per-url output byte payload (≙ save_json, helpers.py:9-21). */
  def renderDocument(pages: Seq[PageData], mode: String,
                     llm: Option[LlmParser] = None): String = {
    val j = if (mode == "standard") standardResult(pages) else constructionResult(pages, llm)
    Canonical.render(j)
  }
}
