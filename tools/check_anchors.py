#!/usr/bin/env python3
"""SURVEY anchor checker (round-8 judge task): cross-check every SURVEY.md
section-2.10 row's declared query ids and source-file anchors against the
actual catalog.

Checks, per table row in section 2.10:
  1. every query id in the Query column resolves to EXACTLY ONE key of the
     query catalog (prefix match on `<id>_`), using the newest
     CORRECTNESS_r*.json as the catalog snapshot;
  2. that key's correctness row is fully green (rows+schema+hash, no err);
  3. every backticked path in the Source column exists under
     src/main/scala/graft/ (or src/test/... when given).
Rows whose Query column is `spec` (spec-pinned, no declared query) pass
check 1-2 vacuously.

Also sweeps the whole of section 2 for `file.scala:NNN` anchors and verifies
the file exists and has at least NNN lines (a stale line anchor after a
refactor fails loudly instead of rotting).

Usage: python3 tools/check_anchors.py   (from the repo root; exit 1 on any
failure, so it slots into the round battery next to compare.py)
"""
import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def newest_correctness():
    files = sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json")))
    if not files:
        sys.exit("no CORRECTNESS_r*.json found")
    return files[-1], json.load(open(files[-1]))


def survey_sections():
    """Return (section2_text, section210_rows)."""
    text = open(os.path.join(ROOT, "SURVEY.md")).read()
    m2 = re.search(r"^## .*?2\..*?$", text, re.M)
    sec2 = text[m2.start():] if m2 else text
    m3 = re.search(r"^## (?!.*2\.)", sec2[2:], re.M)
    if m3:
        sec2 = sec2[: m3.start() + 2]
    m210 = re.search(r"^### 2\.10 .*$", sec2, re.M)
    rows = []
    if m210:
        tail = sec2[m210.end():]
        stop = re.search(r"^#{2,3} ", tail, re.M)
        block = tail[: stop.start()] if stop else tail
        for line in block.splitlines():
            if line.startswith("|") and not re.match(r"^\|[-\s|]+\|?$", line):
                cells = [c.strip() for c in line.strip("|").split("|")]
                if len(cells) >= 5 and cells[0] not in ("#",):
                    rows.append(cells)
    return sec2, rows


def source_catalog():
    """Query ids declared in the source `queries` maps — the fallback for
    rows added AFTER the newest correctness snapshot (a brand-new query is
    not yet in CORRECTNESS_r*.json; a typo'd id is in neither and still
    fails)."""
    ids = set()
    for path in glob.glob(os.path.join(ROOT, "src/main/scala/graft/queries/*.scala")):
        ids.update(re.findall(r'"([a-z]+\d+[a-z0-9_]*)"\s*->', open(path).read()))
    return ids


def main():
    corr_file, corr = newest_correctness()
    catalog = sorted(corr)
    src_catalog = source_catalog()
    pending = []
    sec2, rows = survey_sections()
    fails = []

    qid_re = re.compile(r"\b(dq\d+|[cdgmpqrst]\d+)\b")
    # duplicate op-id check (r14 verdict: T27 was used twice and the
    # query-keyed checks above could not see it)
    seen_ids = {}
    for cells in rows:
        rid = cells[0]
        if rid in seen_ids:
            fails.append(f"{rid}: op id declared twice in §2.10 "
                         f"(rows {seen_ids[rid]!r} and {cells[1]!r})")
        else:
            seen_ids[rid] = cells[1]
    for cells in rows:
        rid, qcol, srccol = cells[0], cells[-1], cells[-2]
        if qcol.strip().lower().startswith("spec"):
            qids = []
        else:
            qids = qid_re.findall(qcol)
            if not qids:
                fails.append(f"{rid}: Query column {qcol!r} has no query id and is not 'spec'")
        for qid in qids:
            hits = [k for k in catalog if k == qid or k.startswith(qid + "_")]
            if not hits:
                src_hits = [k for k in src_catalog
                            if k == qid or k.startswith(qid + "_")]
                if src_hits:
                    pending.extend(src_hits)  # newer than the snapshot
                else:
                    fails.append(f"{rid}: query id {qid!r} resolves to no catalog key")
                continue
            # >1 hit is legitimate (q21 covers both chunker variants) —
            # every resolved key must be green
            for hit in hits:
                row = corr[hit]
                green = (row.get("rows_match") and row.get("schema_match")
                         and row.get("hash_match") and not row.get("err"))
                if not green:
                    fails.append(f"{rid}: {hit} not green in {os.path.basename(corr_file)}: {row}")
        for path in re.findall(r"`([\w/]+\.scala)`", srccol):
            rel = path if path.startswith("src/") else f"src/main/scala/graft/{path}"
            if not os.path.exists(os.path.join(ROOT, rel)):
                fails.append(f"{rid}: source anchor {path} missing ({rel})")
        # line anchors must land AT the query's def (or inside its doc
        # comment, ≤ 80 lines above) — the file-length sweep below cannot
        # see an anchor shifted by insertions earlier in the file (r19: 30
        # rows had rotted silently that way). Vacuous when the anchored
        # file declares no `def <qid>…` (operator/helper anchors).
        for path, line_s in re.findall(r"`([\w/]+\.scala):(\d+)`", srccol):
            rel = path if path.startswith("src/") else f"src/main/scala/graft/{path}"
            full = os.path.join(ROOT, rel)
            if not os.path.exists(full):
                continue  # the sweep below reports the missing file
            src_lines = open(full).read().splitlines()
            ln = int(line_s)
            for qid in qids:
                defs = [i + 1 for i, l in enumerate(src_lines)
                        if re.search(r"\bdef " + qid + r"[A-Z]", l)]
                if defs and not any(d - 80 <= ln <= d + 5 for d in defs):
                    fails.append(
                        f"{rid}: anchor {path}:{ln} drifted from def {qid}… "
                        f"(nearest def at line {min(defs, key=lambda d: abs(d - ln))})")

    # file:line anchors anywhere in section 2
    n_anchors = 0
    for path, line_s in re.findall(r"`((?:[\w/]+/)?[\w]+\.scala):(\d+)`", sec2):
        rel = path if path.startswith("src/") else f"src/main/scala/graft/{path}"
        full = os.path.join(ROOT, rel)
        n_anchors += 1
        if not os.path.exists(full):
            fails.append(f"anchor {path}:{line_s}: file missing ({rel})")
        elif sum(1 for _ in open(full)) < int(line_s):
            fails.append(f"anchor {path}:{line_s}: file has fewer lines")

    print(f"checked {len(rows)} section-2.10 rows + {n_anchors} file:line "
          f"anchors against {os.path.basename(corr_file)} ({len(catalog)} queries)")
    if pending:
        print(f"note: {sorted(set(pending))} declared in source but newer "
              f"than the correctness snapshot — greenness unchecked")
    if fails:
        print("\n".join("FAIL " + f for f in fails))
        sys.exit(1)
    print("ALL ANCHORS OK")


if __name__ == "__main__":
    main()
