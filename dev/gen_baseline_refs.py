#!/usr/bin/env python3
"""Generate BASELINE_REFS.json from BASELINE.md (round-19 judge ask).

BASELINE.md stays the narrative; the machine-readable per-query
reference table lives in BASELINE_REFS.json so the bench guard never
parses markdown again (the round-12 charset incident started there).

Schema: {query: {"ref": seconds, "regime": "sweep"|"isolated",
"round": N|null}}. Regime attribution follows BASELINE.md addendum 17:
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
    regime["dd_minhash_lsh"] = ("sweep", None)
    regime["dd_minhash_lsh_capped"] = ("sweep", None)
    regime["mm_stream_phash"] = ("isolated", 17)
    regime["tx_span_cut"] = ("sweep", None)
    regime["tx_pipeline"] = ("sweep", None)
    out = {
        q: {"ref": refs[q], "regime": regime[q][0], "round": regime[q][1]}
        for q in sorted(refs)
    }
    with open(OUT, "w", encoding="utf-8") as f:
        # one row per line: greppable, and Bench parses it with a
        # per-line regex instead of a JSON library
        f.write("{\n")
        rows = [
            '"%s": {"ref": %s, "regime": "%s", "round": %s}'
            % (q, v["ref"], v["regime"],
               "null" if v["round"] is None else v["round"])
            for q, v in out.items()
        ]
        f.write(",\n".join(rows))
        f.write("\n}\n")
    iso = sum(1 for v in out.values() if v["regime"] == "isolated")
    print("wrote %s: %d refs (%d isolated, %d sweep)"
          % (OUT, len(out), iso, len(out) - iso))


if __name__ == "__main__":
    sys.exit(main())
