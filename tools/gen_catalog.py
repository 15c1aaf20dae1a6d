#!/usr/bin/env python3
"""Regenerate the README "Registered queries" catalog table from the
SparkEntry registry: every `"qNN_name" -> (builder _)` registration is
mapped to the first public graft operator its builder calls (falling back
to the builder itself for thin DataFrame-primitive compositions). Paste
the printed table over the one in README.md; CatalogSpec fails the build
if any registered query or GraftExtensions SQL function is missing from
the README, so the catalog cannot silently drift.

Usage: python3 tools/gen_catalog.py   (from the repo root)
"""
import json
import re

src = open('src/main/scala/graft/SparkEntry.scala').read()
regs = re.findall(r'"(q[0-9]+[a-z_0-9]*)" -> \((\w+) _\)', src)

MODULES = ('text|dedup|search|stats|ops|streaming|multimodal|embed|ingest|'
           'api|functions|estimate|sources')
CLASSES = ('Dedup|Ann|Search|Stats|CorpusOps|TextAnalysis|QualityRules|'
           'TokenBudget|DupClusters|Multimodal|QuantileSketch|Chunker|'
           'Ingest|VectorDb')
call_re = re.compile(
    r'(?:graft\.)?((?:' + MODULES + r')\.[A-Z]\w+(?:\.\w+)?|'
    r'(?:' + CLASSES + r')\.\w+)\(')
body_re_tmpl = (r'private def %s\(s: SparkSession, dir: String\): DataFrame'
                r' =?\s*\{?(.*?)(?=\n  (?:/\*\*|private|def|@volatile|//|val))')

rows = []
for name, fn in regs:
    m = re.search(body_re_tmpl % fn, src, re.S)
    body = m.group(1) if m else ''
    calls = call_re.findall(body)
    rows.append((name, calls[0] if calls else 'SparkEntry.' + fn))

rows.sort(key=lambda p: int(re.match(r'q(\d+)', p[0]).group(1)))
print('| query | entry point | query | entry point |')
print('|---|---|---|---|')
half = (len(rows) + 1) // 2
for i in range(half):
    left = rows[i]
    right = rows[i + half] if i + half < len(rows) else ('', '')
    cells = []
    for n, e in (left, right):
        cells += [f'`{n}`' if n else '', f'`{e}`' if e else '']
    print('| ' + ' | '.join(cells) + ' |')
