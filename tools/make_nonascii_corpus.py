#!/usr/bin/env python3
"""Dev-only: synthesize a NON-ASCII variant of an sf fixture dir.

The shipped fixtures are 100% ASCII, which is what kept the (now fixed)
Java-\\b-vs-RE2-\\b divergence dormant; this tool turns "fixture-safe"
into "proven-safe" (VERDICT r14 next-round #2): it copies every table of
<srcDir> verbatim EXCEPT documents.parquet, whose text gets deterministic
non-ASCII injections — accented letters, CJK, and an emoji placed
DIRECTLY ADJACENT to word islands (the exact adjacency that distinguishes
Java's Unicode \\b from RE2's ASCII \\b), plus precomposed vs decomposed
accents. n_chars is recomputed (code points) so the metadata contract
holds. Then:

    python3 tools/make_nonascii_corpus.py /root/testdata/sf0.001 /tmp/sfna
    sbt -batch "runMain graft.Verify /tmp/sfna /tmp/vna"
    python3 tools/check_oracle.py /tmp/sfna /tmp/vna

Deliberately EXCLUDED injections (documented, out of scope for the \\b
proof): Turkish dotted İ and German ẞ, whose case-folding expansions
differ across Unicode versions and would test the lower()/upper()
implementations rather than the engine's regex/kernel semantics.

NOT part of the shipped engine — driver-side python only.
"""
import os
import shutil
import sys

import duckdb

SRC, DST = sys.argv[1], sys.argv[2]

# rotating injection snippets: island-adjacent non-ASCII first (the
# divergence class), then CJK joins, emoji, decomposed accents, and
# VERTICAL-TAB pieces (r15 ADVICE): DuckDB's RE2 \\s is [\\t\\n\\f\\r ] --
# it does NOT match \\x0B (empirically: regexp_matches(chr(11), '\\s')
# is false on the container's duckdb 1.0.0), so \\x0B must behave as a
# NON-separator in n_tokens (\\S+ glues across it) and as a one-piece
# subtoken ([^A-Za-z0-9\\s] matches it) -- exactly what the TextStats
# kernel does by excluding \\x0B from isSep. Java \\s WOULD match it;
# TextStatsSpec pins that divergence. This injection makes the whole
# oracle battery prove the RE2 alignment end-to-end.
SNIPPETS = [
    "theé étude ABé naïve",          # stop/caps islands flanked by é
    "模型the 是y café ABéCD",    # CJK adjacent to markers
    "\U0001f680rocket the\U0001f680 á étude",  # emoji + NFD
    "deré éund ist中 losé yé leést le\x0bst the\x0ba é\x0b9",  # \v pieces
]

os.makedirs(DST, exist_ok=True)
for f in sorted(os.listdir(SRC)):
    if not f.endswith(".parquet"):
        continue
    if f != "documents.parquet":
        shutil.copy(os.path.join(SRC, f), os.path.join(DST, f))

con = duckdb.connect()
# deterministic: snippet chosen by doc_id; injected mid-text (after the
# first word) AND appended, so islands both start and end adjacencies.
# length() in DuckDB = code points, matching Spark's length().
snip_case = "CASE doc_id % 4 " + " ".join(
    f"WHEN {i} THEN '{s}'" for i, s in enumerate(SNIPPETS)) + " END"
con.execute(f"""
COPY (
  SELECT doc_id,
         concat({snip_case}, ' ', text, ' ', {snip_case}) AS text,
         lang, source,
         length(concat({snip_case}, ' ', text, ' ', {snip_case}))
           AS n_chars
  FROM '{os.path.join(SRC, "documents.parquet")}'
) TO '{os.path.join(DST, "documents.parquet")}' (FORMAT PARQUET)
""")
n = con.sql(f"SELECT count(*), sum(n_chars) FROM "
            f"'{os.path.join(DST, 'documents.parquet')}'").fetchone()
print(f"wrote {DST}: {n[0]} docs, {n[1]} total chars (non-ASCII injected)")
