#!/usr/bin/env python3
"""Deterministic synthetic page corpus (seed=42, no wall-clock).

Produces src/test/resources/corpus/corpus.json: the logical `pages_data`
per url (the shape the reference's strategy layer consumes, see
/root/reference/extractor/services/extraction_service.py:57-78) plus the
payload routing (text | html | pdf) used by the Spark pages-table
synthesizer. Line inventory covers every regex family of the reference
parser (see /root/repo/FIXTURES.md §2).

The corpus is the *input contract*: scripts/gen_goldens.py feeds these
pages to the reference parser to produce byte-golden outputs, and the
Scala engine must reproduce them byte-identically.
"""
import json
import random
from pathlib import Path

OUT = Path(__file__).resolve().parent.parent / "src/test/resources/corpus/corpus.json"

rng = random.Random(42)

FIXTURE_LINES = [
    "VALVE PACKAGE",
    "CIRCULATING PUMP",
    "EYE WASH STATION",
    "COOLING TOWER",
    "PVC pipe fitting",
    "Booster Pump Assembly",
    "EMERGENCY STATION",
    "cast iron drain",
    "stainless steel sink",
    "PAINT BOOTH",
    "BODY REPAIR",
    "BODY SHOP",
    "Expansion Tank Unit",
    "copper coupling reducer",
    "galvanized duct hanger",
    "FCU FAN COIL UNIT",
    "MAU MAKEUP AIR UNIT",
    "mechanical equipment package",
    "wash station fixture",
    "boiler heater vessel",
]

QTY_LINES = [
    "QTY: 3 EA",
    "QUANTITY: 12",
    "qty. 7 pcs",
    "15 pieces",
    "8 ea",
    "QTY: 2.5",
    "(7)",
    "Valve Assembly (12)",
    "4 lf",
    "250 linear feet",
    "36 sq ft",
    "quantity: 31.1",
    "99 units",
    "1 each",
]

MODEL_LINES = [
    "MODEL OM-141",
    "OM-142",
    "HUH-13",
    "CH30",
    "VP1234",
    "PART # AB-92",
    "part number: XK-77-B",
    "SKU: TT450",
    "CAT # ZZ-9",
    "model L01",
    "item # QQ12",
    "MAU-11",
    "pn: RF88X",
]

DIM_LINES = [
    "25' -1 5/8\"",
    "2 x 4 x 6",
    "1 1/2\"ø",
    "3\" diameter",
    "12 mm x 40 mm",
    "BE= 25' -1 5/8\"",
    "10' 6\"",
    "size: 3/4\"",
    "7 x 8",
    "2-1/2\" OD",
    "1/2\"ø HHWR",
    "dia: 0.75",
    "5.5 inches",
    "19 x 6 x 1/8",
]

MOUNT_LINES = [
    "wall-hung",
    "floor mounted",
    "recessed",
    "MOUNTING TYPE: ceiling",
    "ceiling-mount bracket",
    "surface mounted unit",
    "wall mount",
    "suspended",
    "flush-mount",
]

SPEC_LINES = [
    "ASTM D2665",
    "ANSI A112",
    "grade B",
    "spec: 31.1",
    "UL 1453",
    "class A",
    "DWG-123",
    "ref: 30.1",
    "specification: F-100",
    "NFPA 13",
    "rating 125",
]

EXCLUDED_LINES = [
    "ALL RIGHTS RESERVED",
    "COPYRIGHT 2020 ACME CORP",
    "THIS DOCUMENT IS CONFIDENTIAL",
    "USE IN WHOLE OR IN PART STRICTLY PROHIBITED",
    "UP TO MAU-11",
    "SEE PAGE 5",
    "NOTE: install per manufacturer instructions",
    "REFER TO DRAWING S-101",
    "12345",
    "|||---|||",
    "PREPARED BY JOHN DOE",
    "REVISION 3 DATE 11/02/2021",
    "GENERAL NOTES AND LEGEND SHEET",
    "WARNING: high voltage",
    "INSTALL VALVE AT LOW POINT",
    "USE TEFLON TAPE",
]

DRAWING_REFS = [
    "L01-MP-P.1A",
    "LINE 1",
    "DWG-123",
    "A123-DWG-1",
    "L01-MP-P.1A CH30 (2)",
]

ENTITY_LINES = [
    "contact john.doe@example.com for info",
    "call (555) 123-4567",
    "+1 555.123.4567 ext 9",
    "due 12/31/2024",
    "invoice total $1,500.00",
    "see https://example.com/specs?id=42 for details",
    "SSN 123-45-6789 redacted",
    "billing@acme-corp.io or 555-987-6543",
    "paid $42.50 on 1/2/23",
    "visit http://plans.example.org/p1",
]

KV_LINES = [
    "Project: Alpha",
    "Rev: 3",
    "Engineer: Jane Smith",
    "Project: Beta",
    "Contract No: C-1207",
    "Status: Approved",
]

CONTEXT_CLUSTERS = [
    ["VALVE PACKAGE", "QTY: 3 EA", "MODEL OM-141"],
    ["CIRCULATING PUMP", "8 ea", "HUH-13", "wall-hung"],
    ["EYE WASH STATION", "SEE PAGE 5", "ASTM D2665"],
    ["COOLING TOWER", "2 x 4 x 6", "(7)"],
    ["PAINT BOOTH", "OM-142", "floor mounted"],
    ["BODY SHOP", "RECYCLING STORAGE (BODY SHOP)", "spec: 31.1", "2 x 8 x 1/8"],
    ["VALVE 1 1/2\"ø HHWS", "PACKAGE BE= 25' -1 5/8\"", "MAU-11 (6)"],
    ["stainless steel sink", "size: 3/4\"", "SKU: TT450", "recessed"],
]

UNICODE_LINES = [
    "valve 1 1/2\"ø hhws",
    "duct run 12–14 ft – verify on site",
    "col\tA\tB\tC",
    "spacing   test   here",
    "temp 21°C ± 2",
]

ALL_POOLS = [FIXTURE_LINES, QTY_LINES, MODEL_LINES, DIM_LINES, MOUNT_LINES,
             SPEC_LINES, EXCLUDED_LINES, DRAWING_REFS, ENTITY_LINES, KV_LINES,
             UNICODE_LINES]

TABLE_POOL = [
    [
        ["Item", "Qty", "Model", "Size", "Mounting", "Spec"],
        ["Gate Valve", "12 ea", "GV-200", "2\"", "threaded", "ASTM B62"],
        ["Ball Valve", None, "BV-15", None, "welded", "UL 842"],
        ["Check Valve", "3", None, "1/2\"", None, "ANSI B16"],
    ],
    [
        ["Description", "Quantity", "Part #", "Dimensions", "Installation", "Standard"],
        ["Circulating Pump", "2", "CP-88", "18 x 12", "floor", "grade A"],
        [None, "5", "XX-1", None, None, None],
        ["Fan Coil", "no digits here", "FC-3", "24 x 24", "ceiling", "class B"],
    ],
    [
        ["Product", "Count", "Catalog #", "Length", "Location", "Class"],
        ["Copper Pipe", "40", "CU-12", "20'", "riser 2", "type L"],
        ["Hanger Rod", None, "HR-38", "6'", None, "class 1"],
    ],
    [
        ["Notes", "Misc"],
        ["no mapped columns", "at all"],
    ],
    [
        ["Item", "Qty"],
    ],  # header only -> dropped (needs >= 2 rows)
    [
        ["Size", "Mounting"],
        ["3/4\"", "wall"],
        [None, None],
    ],  # only other-fields -> first-cell fallback
]


def make_page_lines():
    n = rng.randint(6, 28)
    lines = []
    while len(lines) < n:
        roll = rng.random()
        if roll < 0.28:
            cluster = rng.choice(CONTEXT_CLUSTERS)
            lines.extend(cluster)
        else:
            pool = rng.choice(ALL_POOLS)
            lines.append(rng.choice(pool))
        if rng.random() < 0.18:
            lines.append("")  # blank line
        if rng.random() < 0.08:
            lines.append("   " + rng.choice(FIXTURE_LINES) + "   ")  # padded
    return lines[:n]


def make_doc(i):
    host = 0 if rng.random() < 0.30 else rng.randint(1, 9)  # host-0 skew
    url = f"https://host-{host}.example/p/{i}"
    payload = rng.choices(["text", "html", "pdf"], weights=[0.4, 0.35, 0.25])[0]
    mode = "construction" if rng.random() < 0.7 else "standard"

    if payload == "html":
        n_pages = 1
    elif payload == "pdf":
        n_pages = rng.randint(1, 4)
    else:
        n_pages = rng.randint(1, 3)

    pages = []
    for p in range(1, n_pages + 1):
        lines = make_page_lines()
        tables = []
        if payload == "html" and rng.random() < 0.5:
            tables = [rng.choice(TABLE_POOL) for _ in range(rng.randint(1, 2))]
            # pages with tables also carry textual indicators (O3 both ways)
            if rng.random() < 0.5:
                lines.append("col\tA\tB\tC")
            else:
                lines.append("| a | b | c | d | e | f | g | h |")
        text = "\n".join(lines)
        width = 612.0 if payload == "pdf" else None
        height = 792.0 if payload == "pdf" else None
        pages.append({
            "page_num": p,
            "text": text,
            "width": width,
            "height": height,
            "tables": tables,
        })

    ts = 1704067200 + (i * 37 % 86400) + (i % 30) * 86400  # 2024-01-01 base
    return {
        "url": url,
        "mode": mode,
        "payload": payload,
        "lang": rng.choices(["en", "de", None], weights=[0.85, 0.1, 0.05])[0],
        "warc_ts": ts,
        "pages": pages,
    }


def make_pdf_table_doc(i, rng2):
    """PDF docs whose pages carry ruled-grid tables (round 2: S3's PDF path).

    Separate RNG so existing docs 0-71 and their goldens stay byte-stable.
    Pages with tables always carry a textual O3 indicator, mirroring the
    html branch (the reference gates table extraction on text indicators,
    pdf_text_extractor.py:167-182).
    """
    host = 0 if rng2.random() < 0.30 else rng2.randint(1, 9)
    url = f"https://host-{host}.example/pt/{i}"
    mode = "construction" if rng2.random() < 0.75 else "standard"
    n_pages = rng2.randint(1, 3)
    pages = []
    for p in range(1, n_pages + 1):
        n = rng2.randint(5, 18)
        lines = []
        while len(lines) < n:
            if rng2.random() < 0.3:
                lines.extend(rng2.choice(CONTEXT_CLUSTERS))
            else:
                lines.append(rng2.choice(rng2.choice(ALL_POOLS)))
        lines = lines[:n]
        tables = []
        if rng2.random() < 0.8:
            tables = [rng2.choice(TABLE_POOL) for _ in range(rng2.randint(1, 2))]
            # the indicator must actually fire the reference's gate
            # (pdf_text_extractor.py:178): '\t', count('|')>15, count('│')>8
            roll = rng2.random()
            if roll < 0.4:
                lines.append("col\tA\tB\tC")
            elif roll < 0.7:
                lines.append("| " + " | ".join("abcdefghijklmnop") + " |")
            else:
                lines.append("│".join(["c1", "c2", "c3", "c4", "c5",
                                       "c6", "c7", "c8", "c9", "c10"]))
        pages.append({
            "page_num": p,
            "text": "\n".join(lines),
            "width": 612.0,
            "height": 792.0,
            "tables": tables,
        })
    ts = 1704067200 + (i * 41 % 86400) + (i % 30) * 86400
    return {
        "url": url,
        "mode": mode,
        "payload": "pdf",
        "lang": rng2.choices(["en", "de", None], weights=[0.85, 0.1, 0.05])[0],
        "warc_ts": ts,
        "pages": pages,
    }


def make_ocr_doc(i, rng3):
    """Scanned-PDF docs (round 3: the S4/S5 OCR seam). A scanned page's
    text layer is a near-empty stub; the real text is only recoverable by
    OCR. `pages` here carry the FULL text — what the reference's downstream
    sees once pytesseract has run (pdf_text_extractor.py:219-237), and what
    the fake engine recovers from the payload's %%OCR sidecar. The Scala
    payload encoder emits the stub text layer + sidecar for docs flagged
    "ocr". No tables: a scanned page has no vector ruling lines for the
    grid reconstructor. Separate RNG so docs 0-83 and their goldens stay
    byte-stable.
    """
    host = 0 if rng3.random() < 0.30 else rng3.randint(1, 9)
    url = f"https://host-{host}.example/scan/{i}"
    mode = "construction" if rng3.random() < 0.6 else "standard"
    n_pages = rng3.randint(1, 3)
    pages = []
    for p in range(1, n_pages + 1):
        n = rng3.randint(6, 20)
        lines = []
        while len(lines) < n:
            if rng3.random() < 0.3:
                lines.extend(rng3.choice(CONTEXT_CLUSTERS))
            else:
                lines.append(rng3.choice(rng3.choice(ALL_POOLS)))
        pages.append({
            "page_num": p,
            "text": "\n".join(lines[:n]),
            "width": 612.0,
            "height": 792.0,
            "tables": [],
        })
    ts = 1704067200 + (i * 53 % 86400) + (i % 30) * 86400
    return {
        "url": url,
        "mode": mode,
        "payload": "pdf",
        "ocr": True,
        "lang": rng3.choices(["en", "de", None], weights=[0.85, 0.1, 0.05])[0],
        "warc_ts": ts,
        "pages": pages,
    }


def main():
    docs = [make_doc(i) for i in range(72)]
    rng2 = random.Random(20260817)
    docs += [make_pdf_table_doc(i, rng2) for i in range(12)]
    rng3 = random.Random(30260817)
    docs += [make_ocr_doc(i, rng3) for i in range(8)]
    OUT.parent.mkdir(parents=True, exist_ok=True)
    with open(OUT, "w", encoding="utf-8") as f:
        json.dump({"docs": docs}, f, indent=1, ensure_ascii=False)
    n_lines = sum(len(p["text"].split("\n")) for d in docs for p in d["pages"])
    print(f"wrote {OUT} docs={len(docs)} total_lines={n_lines}")


if __name__ == "__main__":
    main()
