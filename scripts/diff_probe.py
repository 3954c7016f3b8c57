#!/usr/bin/env python3
"""Differential probe: generate hostile/edge-case one-page documents, run
them through BOTH the reference's pure-Python parsing layer (assembled per
extraction_service.py semantics, as in gen_goldens.py) and the Scala core
(graft.tools.ExtractCli stdin), and byte-compare the canonical JSON.

Usage: diff_probe.py [n_random] [seed]
Exit 0 iff every probe is byte-identical.
"""
import json, random, subprocess, sys, tempfile
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT / "scripts"))

# Reuse the golden generator's reference assembly (loads reference modules).
import gen_goldens as G  # noqa: E402

CLASSPATH = f"{ROOT}/target/scala-2.13/classes:/opt/spark/jars/*"

LINES = [
    "QTY: 3 EA", "VALVE PACKAGE", "CIRCULATING PUMP", "EYE WASH STATION",
    "MODEL OM-141", "HUH-13", "CH30", "VP1234", "PART # AB-9.2", "L01",
    "25' -1 5/8\"", "2 x 4 x 6", "1 1/2\"ø", "3\" diameter", "12 mm x 40 mm",
    "BE= 25' -1 5/8\"", "wall-hung", "floor mounted", "recessed",
    "MOUNTING TYPE: ceiling", "ASTM D2665", "ANSI A112", "grade B",
    "spec: 31.1", "see page 5", "DWG-123", "ALL RIGHTS RESERVED",
    "COPYRIGHT 2020", "UP TO MAU-11", "SEE PAGE 5", "NOTE: check this",
    "L01-MP-P.1A", "LINE 1", "(7)", "Valve Assembly (12)", "4 lf",
    "QUANTITY: 2.5", "12 pcs", "a@b.co and c.d@e.fg", "(555) 123-4567",
    "+1 555.123.4567", "12/31/2024", "$1,500.00", "https://x.io/a b",
    "123-45-6789", "Project: Alpha", "Rev: 3", "Rev: 4", "|||", "42",
    "   ", "", "\t\tcol1\tcol2", "Installation shall comply", "PROVIDE AND INSTALL",
    "Contractor to verify", "ö ß Å title Case", "1 1/2\"ø hhws",
    "MODEL: CH30 QTY: 7 3\" diameter wall mounted ASTM D2665",
]


def gen_doc(rng):
    n = rng.randint(1, 12)
    return "\n".join(rng.choice(LINES) for _ in range(n))


def reference_json(text, mode):
    pages = [{"page_num": 1, "text": text, "width": None, "height": None, "tables": []}]
    if mode == "construction":
        data = G.construction_result(pages, "probe")
    else:
        data = G.standard_result(pages, "probe")
    return json.dumps(data, indent=2, ensure_ascii=False)


def scala_json(text, mode):
    p = subprocess.run(
        ["java", "-Dfile.encoding=UTF-8", "-cp", CLASSPATH,
         "graft.tools.ExtractCli", "stdin", mode],
        input=text.encode("utf-8"), capture_output=True)
    if p.returncode != 0:
        return f"<<exit {p.returncode}: {p.stderr[:200]}>>"
    return p.stdout.decode("utf-8")


def main():
    n_random = int(sys.argv[1]) if len(sys.argv) > 1 else 150
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 42
    rng = random.Random(seed)
    probes = [(ln, m) for ln in LINES for m in ("construction", "standard")]
    probes += [(gen_doc(rng), rng.choice(["construction", "standard"]))
               for _ in range(n_random)]
    bad = 0
    for i, (text, mode) in enumerate(probes):
        want = reference_json(text, mode)
        got = scala_json(text, mode)
        if want != got:
            bad += 1
            if bad <= 3:
                k = next(j for j in range(min(len(want), len(got)) + 1)
                         if j >= len(want) or j >= len(got) or want[j] != got[j])
                print(f"MISMATCH probe {i} [{mode}] input={text[:80]!r}")
                print(f"  at char {k}:\n  ref : {want[max(0,k-80):k+80]!r}\n  ours: {got[max(0,k-80):k+80]!r}")
    print(f"{len(probes)} probes, {bad} mismatches")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
