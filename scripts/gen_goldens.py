#!/usr/bin/env python3
"""Generate byte-golden outputs by running the *reference's own code*
(read-only at /root/reference) over the deterministic corpus.

Loads the reference parser + pydantic models standalone (the package
__init__ pulls in pdfplumber, which is not installable offline; the parsing
layer itself is pure Python — verified). Replicates the strategy-layer
assembly of extraction_service.py:57-151 (construction, no LLM ≙ no API
key) and :468-512 (standard), then serializes with the reference's exact
sink semantics: json.dump(..., indent=2, ensure_ascii=False)
(helpers.py:9-21) with source_pdf popped (extraction_service.py:143-144,
507-509).

Goldens land in src/test/resources/golden/<id>.json; an index maps url →
golden file + mode. sbt -batch test compares bytes.
"""
import hashlib
import importlib
import importlib.util
import json
import sys
import types
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
REF = Path("/root/reference")
CORPUS = ROOT / "src/test/resources/corpus/corpus.json"
GOLDEN = ROOT / "src/test/resources/golden"


def load_module(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    m = importlib.util.module_from_spec(spec)
    sys.modules[name] = m
    spec.loader.exec_module(m)
    return m


cp_mod = load_module("ref_construction", REF / "extractor/parsers/construction.py")
sp_mod = load_module("ref_standard", REF / "extractor/parsers/standard.py")
helpers = load_module("ref_helpers", REF / "extractor/utils/helpers.py")

models_pkg = types.ModuleType("refmodels")
models_pkg.__path__ = [str(REF / "extractor/models")]
sys.modules["refmodels"] = models_pkg
mbase = importlib.import_module("refmodels.base")
mconstr = importlib.import_module("refmodels.construction")
mstd = importlib.import_module("refmodels.standard")

parser = cp_mod.ConstructionParser()
rules = sp_mod.ParserRules()

# ---- reference strategy class, loaded with its package deps stubbed -------
# extraction_service.py imports `extractor.extractors` (pulls pdfplumber,
# not installable offline) and `extractor.models`; stub the former, point
# the latter at the standalone-loaded model modules. This lets the LLM-merge
# goldens run the reference's OWN ConstructionExtractionStrategy end-to-end.
_expkg = types.ModuleType("extractor"); _expkg.__path__ = []
_exex = types.ModuleType("extractor.extractors"); _exex.PDFTextExtractor = object
_exmod = types.ModuleType("extractor.models")
for _m in (mbase, mconstr, mstd):
    for _n in dir(_m):
        if not _n.startswith("_"):
            setattr(_exmod, _n, getattr(_m, _n))
_exparsers = types.ModuleType("extractor.parsers")
_exparsers.ConstructionParser = cp_mod.ConstructionParser
_exparsers.ParserRules = sp_mod.ParserRules
_exutils = types.ModuleType("extractor.utils")
_exhelpers = types.ModuleType("extractor.utils.helpers")
for _n in dir(helpers):
    if not _n.startswith("_"):
        setattr(_exhelpers, _n, getattr(helpers, _n))
sys.modules["extractor"] = _expkg
sys.modules["extractor.extractors"] = _exex
sys.modules["extractor.models"] = _exmod
sys.modules["extractor.parsers"] = _exparsers
sys.modules["extractor.utils"] = _exutils
sys.modules["extractor.utils.helpers"] = _exhelpers
es_mod = load_module("ref_extraction_service", REF / "extractor/services/extraction_service.py")

import re as _re


class FakeLlm:
    """Deterministic offline stand-in for the reference's LLM parser —
    the SAME spec as graft.core.FakeLlmParser (Scala): lines mentioning
    PACKAGE/PUMP/STATION become items (first digit run = quantity, first
    AA-12-shaped token = model, title-cased line = fixture), plus one
    fixed 'discovery' item that exercises the unmatched-residue append.
    """

    def parse(self, text, schema):
        items = []
        for ln in text.split('\n'):
            s = ln.strip()
            u = s.upper()
            if 'PACKAGE' in u or 'PUMP' in u or 'STATION' in u:
                qm = _re.search(r'[0-9]+', s)
                mm = _re.search(r'[A-Z]{2,}-[0-9]+', s)
                items.append({
                    'fixture_type': s.title(),
                    'quantity': int(qm.group()) if qm else None,
                    'model_number': mm.group() if mm else None,
                    'dimensions': None,
                    'mounting_type': None,
                    'spec_reference': None,
                    'page_number': 1,
                })
        items.append({
            'fixture_type': 'Auxiliary Drain Assembly', 'quantity': 4,
            'model_number': 'AD-77', 'dimensions': '2 x 2',
            'mounting_type': 'floor mounted', 'spec_reference': 'ASTM F100',
            'page_number': 2,
        })
        return {'items': items}


def construction_result_llm(pages_data, url):
    """Run the reference's ConstructionExtractionStrategy with the fake
    second source (extraction_service.py:57-151 + :225-316 merge path),
    then pop source_pdf and the _llm_* flags exactly as main.py:131-134.
    """
    strategy = es_mod.ConstructionExtractionStrategy(parser, llm_parser=FakeLlm())
    output = strategy.extract(pages_data, str(url))
    output.pop('source_pdf', None)
    output.pop('_llm_used', None)
    output.pop('_llm_requested', None)
    return output


def validate_items(items):
    # extraction_service.py:153-174
    validated = []
    for item in items:
        try:
            validated.append(mconstr.ExtractedItem(**item))
        except Exception:
            validated.append(mconstr.ExtractedItem(
                page_number=item.get('page_number', 1),
                fixture_type=item.get('fixture_type'),
                quantity=item.get('quantity'),
                model_number=item.get('model_number'),
                dimensions=item.get('dimensions'),
                mounting_type=item.get('mounting_type'),
                spec_reference=item.get('spec_reference'),
                table_number=item.get('table_number'),
                row_number=item.get('row_number'),
                raw_text=item.get('raw_text'),
                line_number=item.get('line_number'),
            ))
    return validated


def construction_result(pages_data, url):
    # extraction_service.py:57-151 without progress prints / LLM
    all_items, all_tables = [], []
    for page_data in pages_data:
        items = parser.extract_items(page_data.get('text', ''), page_data.get('page_num', 0))
        all_items.extend(items)
        tables = page_data.get('tables', [])
        if tables:
            table_items = parser.parse_tables(tables, page_data.get('page_num', 0))
            all_tables.extend(tables)
            all_items.extend(table_items)

    validated = validate_items(all_items)
    summary = mconstr.ConstructionExtractionSummary(
        total_items=len(validated),
        items_with_quantities=sum(1 for it in validated if it.quantity is not None),
        items_with_model_numbers=sum(1 for it in validated if it.model_number),
        items_with_dimensions=sum(1 for it in validated if it.dimensions),
        items_with_mounting_type=sum(1 for it in validated if it.mounting_type),
        pages_processed=len(pages_data),
        tables_found=len(all_tables),
    )
    page_infos = []
    for p in pages_data:  # extraction_service.py:193-214
        try:
            text_preview = p.get('text', '')
            if len(text_preview) > 200:
                text_preview = text_preview[:200] + '...'
            page_infos.append(mbase.PageInfo(
                page_num=p.get('page_num', 1),
                text_preview=text_preview if text_preview else None,
                has_tables=bool(p.get('tables'))))
        except Exception:
            page_infos.append(mbase.PageInfo(
                page_num=max(1, p.get('page_num', 1)), text_preview=None, has_tables=False))
    statistics = mbase.Statistics(**helpers.get_statistics(pages_data))
    result = mconstr.ConstructionExtractionResult(
        source_pdf=str(url),
        extraction_mode='construction_takeoff',
        total_items_found=len(validated),
        items=validated,
        summary=summary,
        pages=page_infos,
        statistics=statistics,
    )
    output = result.model_dump(mode='json')
    output.pop('source_pdf', None)
    return output


def standard_result(pages_data, url):
    # extraction_service.py:468-512
    full_text = helpers.combine_pages_text(pages_data)
    entities_dict = rules.extract_entities(full_text)
    statistics = mbase.Statistics(**helpers.get_statistics(pages_data))
    entities = mstd.ExtractedEntities.from_dict(entities_dict)
    validated_pages = []
    for page_dict in pages_data:
        validated_pages.append(mbase.PageData(
            page_num=page_dict['page_num'],
            text=page_dict.get('text', ''),
            width=page_dict.get('width'),
            height=page_dict.get('height'),
            tables=helpers.normalize_table_cells(page_dict.get('tables'))))
    result = mstd.StandardExtractionResult(
        source_pdf=str(url),
        extraction_mode='standard',
        pages=validated_pages,
        full_text=full_text,
        statistics=statistics,
        entities=entities,
    )
    output = result.model_dump(mode='json')
    output.pop('source_pdf', None)
    return output


def main():
    corpus = json.load(open(CORPUS, encoding='utf-8'))
    GOLDEN.mkdir(parents=True, exist_ok=True)
    (GOLDEN / "llm").mkdir(parents=True, exist_ok=True)
    index = []
    n_llm = 0
    for doc in corpus['docs']:
        url, mode, pages = doc['url'], doc['mode'], doc['pages']
        out = (construction_result(pages, url) if mode == 'construction'
               else standard_result(pages, url))
        doc_id = hashlib.sha1(url.encode()).hexdigest()[:16]
        path = GOLDEN / f"{doc_id}.json"
        with open(path, 'w', encoding='utf-8') as f:
            json.dump(out, f, indent=2, ensure_ascii=False)
        index.append({"url": url, "id": doc_id, "mode": mode})
        if mode == 'construction':
            # second golden set: the same doc with the fake LLM source wired
            out_llm = construction_result_llm(pages, url)
            with open(GOLDEN / "llm" / f"{doc_id}.json", 'w', encoding='utf-8') as f:
                json.dump(out_llm, f, indent=2, ensure_ascii=False)
            n_llm += 1
    with open(GOLDEN / "index.json", 'w', encoding='utf-8') as f:
        json.dump(index, f, indent=1)
    print(f"wrote {len(index)} goldens to {GOLDEN} (+{n_llm} llm-merge goldens)")


if __name__ == "__main__":
    main()
