#!/usr/bin/env python3
"""Generate BASELINE_REFS.json from BASELINE.md (round-19 judge ask).

BASELINE.md stays the narrative; the machine-readable per-query
reference table lives in BASELINE_REFS.json so the bench guard never
parses markdown again (the round-12 charset incident started there).

Schema: {query: {"ref": seconds, "regime": "sweep"|"isolated",
"round": N|null, "oracle": "sql"|"rows-only"}}. The oracle class says
how the driver checks the row (round-19 judge ask #7): "sql" = the
gate has a DuckDB oracle entry (hash-checked), "rows-only" = it does
not (weaker check). Derived by scanning the query packs' `val oracle`
map literals; BaselineRefsSpec re-derives the classes from
SparkEntry.oracleSql AT RUNTIME and fails on any drift, so the scan
cannot silently rot. Regime attribution follows BASELINE.md addendum 17:
rows referenced only by the §4 table are SWEEP-context numbers; rows
(re-)minted in a "Round-N addendum" paragraph are ISOLATED
medians-of-3 (each addendum says so), attributed to the LAST addendum
that names them. Glob mentions (`tx_bpe_*`) expand against the table.

Run after every ref mint/re-mint: dev/gen_baseline_refs.py
A spec (BaselineRefsSpec) pins JSON == table agreement.
"""
import json
import re
import sys

MD = "/root/repo/BASELINE.md"
OUT = "/root/repo/BASELINE_REFS.json"


def main():
    lines = open(MD, encoding="utf-8").read().splitlines()
    # 1. the per-query table: exactly-two-cell rows whose second cell
    # parses as a float (the same rule Bench.baseline used)
    refs = {}
    for ln in lines:
        cells = [c.strip() for c in ln.split("|") if c.strip()]
        if len(cells) == 2:
            try:
                refs[cells[0]] = float(cells[1])
            except ValueError:
                pass
    # 2. addendum paragraphs: "Round-N addendum..." until a blank line
    regime = {q: ("sweep", None) for q in refs}
    i = 0
    while i < len(lines):
        m = re.match(r"Round-(\d+) addendum", lines[i])
        if m:
            rnd = int(m.group(1))
            para = []
            while i < len(lines) and lines[i].strip():
                para.append(lines[i])
                i += 1
            text = " ".join(para)
            for q in refs:
                if re.search(r"\b" + re.escape(q) + r"\b", text):
                    regime[q] = ("isolated", rnd)
            # glob mentions like `tx_bpe_*`
            for g in re.findall(r"`([A-Za-z0-9_]+_)\*`", text):
                for q in refs:
                    if q.startswith(g):
                        regime[q] = ("isolated", rnd)
        else:
            i += 1
    # explicit overrides where an addendum MENTIONS a row without
    # minting it (the name-scan cannot tell discussion from minting):
    # - dd_minhash_lsh / _capped: addendum 17 discusses their sweep/
    #   isolated asymmetry; the regime paragraph says both refs are
    #   SWEEP-context numbers
    # - mm_stream_phash: minted in Round-17 addendum (14); addendum 18
    #   cites it as the family precedent
    # - tx_span_cut: pre-addendum sweep ref; addendum 20 cites it as a
    #   shape comparison for tx_contamination_cut
    # - tx_pipeline: addendum 26 cites its in-band isolated reading as
    #   evidence the packing change left it alone — its 2.45 ref stays
    #   the r9 sweep number
    # Each override is SCOPED to the specific addendum whose mention
    # the name-scan misreads (round-19 advice): if the scan attributes
    # the row to a DIFFERENT addendum than the known-discussion one, a
    # later addendum genuinely re-minted it — fail loudly instead of
    # silently overriding the new mint.
    overrides = {
        "mm_stream_phash": (18, ("isolated", 17)),
        "tx_span_cut": (20, ("sweep", None)),
        # addendum 29 is the dd_semantic_* drift ADJUDICATION — it
        # cites isolated readings to CLEAR the rows and keeps their
        # sweep refs ("Table refs unchanged for all three"); the
        # tx_pipeline_full context check likewise leaves its r19 mint
        # (addendum 24) in place
        "dd_semantic_dedup": (29, ("sweep", None)),
        "dd_semantic_groups": (29, ("sweep", None)),
        "tx_pipeline_full": (29, ("isolated", 19)),
        # addendum 30 (round 22) re-minted thirteen rows under the
        # cold-median regime as best-of-two FULL SWEEPS — sweep-context
        # numbers, so the name-scan's "isolated" attribution is
        # corrected here (this REPLACES the stale addendum-17/26/29
        # overrides for dd_minhash_lsh{,_capped}/tx_pipeline/
        # dd_neardup_clusters, per the assert's own instruction)
        "dd_compacted_neardup": (30, ("sweep", None)),
        "dd_incremental_neardup": (30, ("sweep", None)),
        "dd_minhash_lsh": (30, ("sweep", None)),
        "dd_minhash_lsh_capped": (30, ("sweep", None)),
        "dd_neardup_clusters": (30, ("sweep", None)),
        "dd_negative_control": (30, ("sweep", None)),
        "dd_ngram_jaccard": (30, ("sweep", None)),
        "tx_classifier_score": (30, ("sweep", None)),
        "tx_classifier_cut": (30, ("sweep", None)),
        "tx_contamination": (30, ("sweep", None)),
        "tx_lm_threshold": (30, ("sweep", None)),
        "tx_pipeline": (30, ("sweep", None)),
        "tx_top_terms": (30, ("sweep", None)),
    }
    for q, (known_addendum, corrected) in overrides.items():
        # the scan's addendum index: the Round-N addendum number is not
        # recorded per row, so scope via the round the scan attributed —
        # a mismatch with the known-discussion round means a re-mint
        known_round = {17: 18, 18: 18, 20: 18, 26: 19, 29: 20, 30: 22}[known_addendum]
        got = regime.get(q, ("sweep", None))
        assert got[0] == "sweep" or got[1] == known_round, (
            "override for %s expected the scan to attribute round %s "
            "(addendum %d's discussion) but the scan says %r — a later "
            "addendum re-minted this row; DELETE the stale override"
            % (q, known_round, known_addendum, got))
        regime[q] = corrected
    # oracle class per gate: "sql" when the name keys an entry of a
    # query pack's `val oracle` map literal (keys scanned AFTER the
    # map declaration — the queries maps, which share the names, are
    # declared before it in every pack), else "rows-only"
    sql_gates = set()
    for pack in ("RelationalPack", "TrainingPack", "IngestPack"):
        src = open("/root/repo/src/main/scala/graft/queries/%s.scala" % pack,
                   encoding="utf-8").read()
        m = re.search(r"val oracle: Map\[String, String\] = Map\(", src)
        assert m, "no `val oracle` map in %s — oracle-class scan broken" % pack
        sql_gates.update(re.findall(r'"([A-Za-z0-9_]+)"\s*->', src[m.end():]))
    out = {
        q: {"ref": refs[q], "regime": regime[q][0], "round": regime[q][1],
            "oracle": "sql" if q in sql_gates else "rows-only"}
        for q in sorted(refs)
    }
    with open(OUT, "w", encoding="utf-8") as f:
        # one row per line: greppable, and Bench parses it with a
        # per-line regex instead of a JSON library ("ref" stays the
        # first field — Bench's matcher reads it positionally-free but
        # older tooling may not)
        f.write("{\n")
        rows = [
            '"%s": {"ref": %s, "regime": "%s", "round": %s, "oracle": "%s"}'
            % (q, v["ref"], v["regime"],
               "null" if v["round"] is None else v["round"], v["oracle"])
            for q, v in out.items()
        ]
        f.write(",\n".join(rows))
        f.write("\n}\n")
    iso = sum(1 for v in out.values() if v["regime"] == "isolated")
    n_sql = sum(1 for v in out.values() if v["oracle"] == "sql")
    print("wrote %s: %d refs (%d isolated, %d sweep; %d sql, %d rows-only)"
          % (OUT, len(out), iso, len(out) - iso, n_sql, len(out) - n_sql))


if __name__ == "__main__":
    sys.exit(main())
