package graft.core

/** All pattern tables of the reference's construction parser, transcribed
  * verbatim so the Python↔Scala parity surface is auditable in one place.
  * Sources (reference, read-only): exclude/instruction lists
  * construction.py:15-33, fixture construction.py:36-52, quantity :55-70,
  * model :73-81, dimension :84-118, mounting :120-134, spec :136-151,
  * full-dim (inline in _detect_item_line) :431-447, drawing refs :537-542,
  * table column keyword map :780-787, entity patterns standard.py:12-19.
  */
object Semantics {

  val excludePatterns: List[String] = List(
    """\b(prohibited|copyright|reserved|confidential|proprietary)\b""",
    """\b(use\s+in\s+whole|in\s+part|strictly\s+prohibited)\b""",
    """\b(all\s+rights\s+reserved|page\s+\d+|document\s+control)\b""",
    """\b(revision|date|prepared\s+by|approved\s+by)\b""",
    """^[A-Z\s]{20,}$""",
    """^\d+$""",
    """^[^\w\s]+$""",
    """^\s*(up\s+to|see\s+|refer\s+to|see\s+page|refer\s+page|see\s+drawing|refer\s+drawing|see\s+spec|refer\s+spec)\b""",
    """^\s*(note:|notice:|warning:|caution:)\b""",
    """^\s*(see|refer|use|install|mount|connect)\s+[A-Z0-9\-]+"""
  )

  val instructionPhrases: List[String] = List(
    "up to", "see", "refer to", "see page", "refer page", "see drawing", "refer drawing",
    "see spec", "refer spec", "use", "install", "mount", "connect", "note:", "notice:"
  )

  val fixturePatterns: List[String] = List(
    """\b(pipe|fitting|duct|conduit|fixture|valve|faucet|sink|toilet|shower|bathtub|drain|vent|elbow|tee|coupling|reducer|adapter|cap|plug|flange|gasket|hanger|bracket|mount)\b""",
    """\b(pump|circulating\s+pump|booster\s+pump|centrifugal\s+pump|pump\s+package)\b""",
    """\b(equipment|boiler|heater|tower|cooling\s+tower|tank|reservoir|vessel|chiller)\b""",
    """\b(station|wash\s+station|eye\s+wash|safety\s+station|emergency\s+station)\b""",
    """\b(connection|fixture\s+connection|piping\s+connection|cooling\s+connection)\b""",
    """\b(package|valve\s+package|equipment\s+package|fixture\s+package)\b""",
    """\b(shop\s+fixture|repair\s+shop|body\s+shop|paint\s+booth|booth\s+equipment)\b""",
    """\b(fixtures|body\s+repair|paint\s+equipment|mechanical\s+equipment)\b""",
    """\b(ABS|PVC|CPVC|PEX|copper|steel|stainless|galvanized|cast\s+iron|brass|bronze)\b""",
    """\b(item|component|part|unit|assembly|system)\b"""
  )

  val quantityPatterns: List[String] = List(
    """\b(?:qty|quantity|qty\.)[:\s]+(\d+(?:\.\d+)?)\b""",
    """\b(?:qty|quantity)[:\s]+(\d+(?:\.\d+)?)\s*(?:ea|each|pcs|pieces|unit|units)?\b""",
    """\b(\d+)\s*(?:ea|each|pcs|pieces|pc|unit|units)\b""",
    """\b(\d+)\s*(?:lf|linear feet|ft|feet|sq ft|sq\.?\s*ft\.?|square feet)\b""",
    """(?<!-)(?<![A-Z])\b(\d+\.\d+)(?:\s*,\s*\d+(?:\.\d+)?)*\b(?![-A-Z])""",
    """\((\d+)\)(?:\s|$)""",
    """\b[A-Z][A-Za-z\s]+\s*\((\d+)\)""",
    """(?:^|\s|,|:)\s*(\d{1,3})\s*(?:ea|each|pcs|pieces|qty|quantity|unit|units|$)"""
  )

  val modelPatterns: List[String] = List(
    """\b(model|part\s*#|part\s*number|pn|sku|cat\s*#|catalog\s*#|item\s*#)[:\s]+([A-Z0-9\-\.]+)""",
    """\b([A-Z]{2,}-\d+[A-Z0-9\-]*)\b""",
    """\b([A-Z]{1,3}\d{2,}[A-Z0-9]*)\b""",
    """\b([A-Z]{2,}\d+[A-Z0-9])\b"""
  )

  val dimensionPatterns: List[String] = List(
    "\\b(\\d+)\\s*[\"\\']\\s*[-–]\\s*(\\d+)\\s*(\\d+\\/\\d+)\\s*[\"\\']",
    "\\b(\\d+)\\s*[\"\\']\\s*[-–]\\s*(\\d+)\\s*[\"\\']",
    "\\b(\\d+)\\s*[\"\\']\\s+(\\d+)\\s*(\\d+\\/\\d+)\\s*[\"\\']",
    "\\b(\\d+)\\s*[\"\\']\\s+(\\d+)\\s*[\"\\']",
    "\\b(\\d+)\\s*[\"\\']\\s*[-–]\\s*(\\d+)\\s*(\\d+\\/\\d+)\\b",
    "\\b(\\d+)\\s*[\"\\']\\s*[-–]?\\s*(\\d+)\\s*(\\d+\\/\\d+)\\s*[\"\\']?\\b",
    """\b(\d+[\/\.]\d+|\d+(?:\.\d+)?)\s*["\']?\s*x\s*(\d+[\/\.]\d+|\d+(?:\.\d+)?)\s*["\']?\s*x\s*(\d+[\/\.]\d+|\d+(?:\.\d+)?)\s*["\']?\b""",
    """\b(\d+[\/\.]\d+|\d+(?:\.\d+)?)\s*["\']?\s*x\s*(\d+[\/\.]\d+|\d+(?:\.\d+)?)\s*["\']?\b""",
    """\b(\d+[\/\.]\d+|\d+(?:\.\d+)?)\s*["\']\s*(?:diameter|dia|OD|ID|D|DIA)\b""",
    """\b(\d+[\/\.]\d+|\d+(?:\.\d+)?)\s*inch(es)?\s*(?:diameter|dia|OD|ID)\b""",
    """\b(?:diameter|dia|OD|ID|D|DIA)[\s:]+(\d+[\/\.]\d+|\d+(?:\.\d+)?)\s*["\']?\b""",
    """\b(\d+(?:\.\d+)?)\s*["\'](?!\s*x)(?![A-Z0-9])""",
    """\b(\d+(?:\.\d+)?)\s*(?:inch|inches|in|ft|feet|cm|mm)\b""",
    """\b(\d+\s*[\/\-]\s*\d+\/\d+)\s*["\']\b""",
    """(\d+\s+\d+\/\d+\s*["\']?\s*ø)""",
    """(\d+[- ]\d+\/\d+\s*["\']?\s*ø)""",
    """(\d+\/\d+\s*["\']?\s*ø)""",
    """(\d+\s*["\']?\s*ø)""",
    """(?:diameter|dia|OD|ID|size|dimension)[:\s]+(\d+\/\d+)\s*["\']?""",
    """(?:\d+\s+)?(\d+\/\d+)\s*["\']\s*(?:diameter|dia|OD|ID|inch|inches)""",
    """\b(\d+(?:\.\d+)?)\s*(?:mm|cm|m)\s*x\s*(\d+(?:\.\d+)?)\s*(?:mm|cm|m)\b"""
  )

  val mountingPatterns: List[String] = List(
    """\b(wall[-\s]*(?:hung|mount|mounted|mounting))\b""",
    """\b(floor[-\s]*(?:mount|mounted|mounting))\b""",
    """\b(ceiling[-\s]*(?:mount|mounted|mounting))\b""",
    """\b(surface[-\s]*(?:mount|mounted|mounting))\b""",
    """\b(recessed|concealed|exposed|flush|flush[-\s]mount|undercounter|countertop|freestanding|portable|stationary|fixed|removable|slip[-\s]on|threaded|welded|bolted|hanging|suspended|ceiling[-\s]hung)\b""",
    """\b(mounting[-\s]type[:\s]+)(wall|floor|ceiling|surface|recessed|exposed)\b"""
  )

  val specPatterns: List[String] = List(
    """\b(ASTM|ANSI|UL|CSA|ASME|NEMA|NFPA|AWWA|IPC|ISO|DIN|BS)[\s\-]?([A-Z0-9\.\-]+)""",
    """\b(grade|class|type|rating)\s+([A-Z0-9]+)""",
    """\b(spec[\.:]?\s*#?|specification[:\s]*|ref[\.:]?\s*#?|reference[:\s]*)([A-Z0-9\.\-]+)""",
    """\b(dwg[\.:]?\s*#?|drawing[:\s]*)([A-Z0-9\.\-]+)""",
    """\b(\d+\.\d+)(?:\s|$|,|;|:)(?!\s*(?:ea|each|pcs|pieces|qty|quantity))""",
    """\b(page\s+#?|pg[\.:]?\s*#?|p[\.:]?\s*#?)(\d+)""",
    """\b(see\s+)?(?:page|pg|p)\.?\s*(\d+)""",
    """\b(\d+)[\s\-]+(?:page|pg)\b"""
  )

  /** construction.py:431-447 — full-dimension re-extraction, checked in order. */
  val fullDimPatterns: List[String] = List(
    """(\d+\s+\d+\/\d+\s*["\']?\s*ø)""",
    """(\d+[- ]\d+\/\d+\s*["\']?\s*ø)""",
    """(\d+\/\d+\s*["\']?\s*ø)""",
    """(\d+\s*["\']?\s*ø)""",
    "(\\d+\\s*[\"\\']\\s*[-–]\\s*\\d+\\s+\\d+\\/\\d+\\s*[\"\\'])",
    "(\\d+\\s*[\"\\']\\s*[-–]\\s*\\d+\\s*[\"\\'])",
    "(\\d+\\s*[\"\\']\\s+\\d+\\s+\\d+\\/\\d+\\s*[\"\\'])",
    "(\\d+\\s*[\"\\']\\s+\\d+\\s*[\"\\'])",
    "(\\d+\\s*[\"\\']\\s*[-–]?\\s*\\d+\\s*\\d+\\/\\d+)",
    "(\\d+\\s*[\"\\']\\s*[-–]?\\s*\\d+\\s*\\d+\\/\\d+\\s*[\"\\']?)",
    "(?:[=:]\\s*)(\\d+\\s*[\"\\']\\s*[-–]?\\s*\\d+\\s*\\d+\\/\\d+\\s*[\"\\']?)",
    "(?:[=:]\\s*)(\\d+\\s*[\"\\']\\s*[-–]?\\s*\\d+\\s*[\"\\']?)"
  )

  /** construction.py:537-542 — drawing/line reference patterns (matched
    * against the upper-cased stripped line, case-sensitively).
    */
  val drawingReferencePatterns: List[String] = List(
    """^[A-Z]\d+[-\.][A-Z]+[-\.]""",
    """^LINE\s+\d+""",
    """^DWG[-\.]\d+""",
    """^[A-Z]+\d*[-\.]MP[-\.]"""
  )

  /** construction.py:305-308 — model shapes used by the quantity veto. */
  val modelPatternsInLine: List[String] = List(
    """[A-Z]{2,}-\d+""",
    """[A-Z]{1,3}\d{2,}"""
  )

  /** construction.py:611-615 — phrases excluded from inferred fixture type. */
  val inferredTypeExcludePhrases: List[String] = List(
    "OR USE", "USE IN", "IN WHOLE", "IN PART", "PROHIBITED",
    "COPYRIGHT", "ALL RIGHTS", "RESERVED", "CONFIDENTIAL",
    "STRICTLY PROHIBITED", "WITHOUT WRITTEN"
  )

  /** construction.py:372,394 — legal-text veto words for short model codes. */
  val legalWords: List[String] =
    List("PROHIBITED", "COPYRIGHT", "RESERVED", "CONFIDENTIAL", "USE IN")

  /** construction.py:780-787 — table header keyword map, in field order. */
  val columnMapping: List[(String, List[String])] = List(
    "fixture_type" -> List("item", "fixture", "type", "description", "product", "component"),
    "quantity" -> List("qty", "quantity", "qty.", "count", "number", "pieces"),
    "model_number" -> List("model", "part #", "part number", "pn", "sku", "cat #", "catalog #", "item #"),
    "dimensions" -> List("size", "dimension", "dimensions", "length", "width", "height", "diameter"),
    "mounting_type" -> List("mounting", "mount", "installation", "location"),
    "spec_reference" -> List("spec", "specification", "standard", "grade", "class")
  )

  /** standard.py:12-19 — entity patterns, insertion order is part of the
    * JSON byte contract.
    */
  val entityPatterns: List[(String, String)] = List(
    "email" -> """\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Z|a-z]{2,}\b""",
    "phone" -> """(\+?\d{1,3}[-.\s]?)?\(?\d{3}\)?[-.\s]?\d{3}[-.\s]?\d{4}""",
    "date" -> """\d{1,2}[/-]\d{1,2}[/-]\d{2,4}""",
    "currency" -> """\$[\d,]+\.?\d*""",
    "url" -> """https?://[^\s]+""",
    "ssn" -> """\d{3}-\d{2}-\d{4}"""
  )
}
