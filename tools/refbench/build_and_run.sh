#!/bin/sh
# Build + run the reference-parser micro-benchmark (measurement harness
# only: links the reference's .cpp files from /root/reference unmodified;
# no reference code is vendored into this repo).
set -e
cd "$(dirname "$0")"
python - <<'PY'
import sys; sys.path.insert(0, '../..')
from logparser_spark.sources.corpus import GOLDEN_LINES
with open('corpus_lines.inc', 'w') as f:
    for l in GOLDEN_LINES:
        esc = l.replace('\\', '\\\\').replace('"', '\\"')
        f.write(f'"{esc}",\n')
PY
REF=/root/reference/src
gcc -O2 -c $REF/common/logging.c -I$REF/common -o logging.o
g++ -O2 -std=c++17 -I$REF -I$REF/line_parsing -I$REF/file_parsing -I$REF/common \
  bench_ref.cpp \
  $REF/line_parsing/line_parser.cpp $REF/line_parsing/parsing_basics.cpp \
  $REF/line_parsing/parsing_data.cpp $REF/file_parsing/filter_parsing.cpp \
  $REF/file_parsing/line_filter.cpp $REF/file_parsing/processed_line.cpp \
  $REF/common/string_utils.cpp logging.o -o bench_ref
./bench_ref 30000
