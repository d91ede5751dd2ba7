"""Property-based tests for the structured sources (hypothesis), mirroring
the log parsers' coverage (tests/test_property_parse.py) per VERDICT r3
task #7. Invariants of the dead-letter contract (sources/structured.py):

1. **Totality**: every non-blank input line produces exactly one output
   row — parsed (error_line NULL) or dead-lettered with the raw line
   verbatim. Blank/whitespace-only lines are dropped (JSONL explicitly,
   CSV by the reader).
2. **Round-trip**: a well-formed line built from arbitrary field values
   parses back to exactly those values with error_line NULL; absent JSON
   fields surface as NULL without dead-lettering.
3. **Dead-letter capture**: syntactically-broken JSON, non-struct JSON,
   wrong-arity CSV rows, and un-castable CSV fields all yield rows whose
   error_line is the raw input line.
"""

from __future__ import annotations

import json
import os
import re

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql.types import LongType, StringType, StructField, StructType

from aws_logs_parquet_converter_spark.sources.structured import (
    dead_letter_stats,
    read_csv,
    read_jsonl,
)

SCHEMA = StructType(
    [
        StructField("i", LongType()),
        StructField("a", LongType()),
        StructField("b", StringType()),
    ]
)

# any printable unicode, no surrogates/controls (json.dumps escapes keep
# the emitted line newline-free regardless)
free_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs", "Cc")), max_size=40
)

# CSV-safe field text: printable, no whitespace / separator / quote /
# escape, and never integer-shaped (so it can't collide with the int class)
csv_text = st.text(
    alphabet=st.characters(
        blacklist_categories=("Cs", "Cc", "Zs", "Zl", "Zp"),
        blacklist_characters=',"\\',
    ),
    min_size=1,
    max_size=20,
).filter(lambda s: not re.fullmatch(r"-?\d+", s))

maybe_int = st.one_of(st.none(), st.integers(min_value=-(10**15), max_value=10**15))
doc = st.fixed_dictionaries(
    {}, optional={"a": maybe_int, "b": free_text}
)

# a line that is definitely not a parseable JSON struct
broken_json = st.one_of(
    st.text(
        alphabet=st.characters(blacklist_categories=("Cs", "Cc", "Zs", "Zl", "Zp")),
        min_size=1,
        max_size=30,
    ).filter(
        lambda s: not _parses_as_object(s)
    ),
    st.integers().map(lambda n: f'{{"i": {n}, '),  # truncated object
)


def _parses_as_object(s: str) -> bool:
    try:
        return isinstance(json.loads(s), dict)
    except Exception:
        return False


def _write(name: str, lines: list[str]) -> str:
    # hypothesis forbids function-scoped fixtures (tmp_path) under @given;
    # a per-example mkdtemp keeps examples isolated instead
    import tempfile

    p = os.path.join(tempfile.mkdtemp(prefix="prop_structured_"), name)
    with open(p, "w") as f:
        f.write("\n".join(lines))
    return p


@settings(max_examples=6, deadline=None)
@given(docs=st.lists(doc, min_size=0, max_size=20), bad=st.lists(broken_json, max_size=6))
def test_jsonl_totality_roundtrip_and_dead_letter(spark, docs, bad):
    lines: list[str] = []
    for i, d in enumerate(docs):
        lines.append(json.dumps({"i": i, **d}))
    lines.extend(bad)
    lines.extend(["", "   "])  # blank lines: dropped
    p = _write("prop.jsonl", lines)
    rows = read_jsonl(spark, p, SCHEMA).collect()

    non_blank = [ln for ln in lines if ln.strip()]
    assert len(rows) == len(non_blank)  # totality

    parsed = {r.i: r for r in rows if r.error_line is None}
    dead = sorted(r.error_line for r in rows if r.error_line is not None)
    # every generated doc round-trips exactly, absent fields -> NULL
    assert sorted(parsed) == list(range(len(docs)))
    for i, d in enumerate(docs):
        assert parsed[i].a == d.get("a") and parsed[i].b == d.get("b")
    # every dead letter is one of the broken inputs, verbatim
    assert dead == sorted(bad)

    stats = dead_letter_stats(read_jsonl(spark, p, SCHEMA)).collect()[0]
    assert stats.n_rows == len(non_blank) and stats.n_dead_letters == len(bad)


@settings(max_examples=6, deadline=None)
@given(
    rows=st.lists(
        st.tuples(maybe_int, st.one_of(st.none(), csv_text)), min_size=0, max_size=20
    ),
    bad_vals=st.lists(csv_text, max_size=5),
)
def test_csv_totality_roundtrip_and_dead_letter(spark, rows, bad_vals):
    lines = [
        f"{i},{'' if a is None else a},{'' if b is None else b}"
        for i, (a, b) in enumerate(rows)
    ]
    # un-castable `a` field -> dead letter; wrong arity -> dead letter
    bad = [f"{1000 + j},{v},x" for j, v in enumerate(bad_vals)]
    bad += [f"{2000 + j},1,x,extra" for j in range(len(bad_vals))]
    p = _write("prop.csv", lines + bad + [""])
    df = read_csv(spark, p, SCHEMA, header=False)
    out = df.collect()

    assert len(out) == len(lines) + len(bad)  # totality (blank dropped)
    parsed = {r.i: r for r in out if r.error_line is None}
    dead = sorted(r.error_line for r in out if r.error_line is not None)
    assert sorted(parsed) == list(range(len(rows)))
    for i, (a, b) in enumerate(rows):
        assert parsed[i].a == a and parsed[i].b == b  # round-trip
    assert dead == sorted(bad)  # raw lines preserved verbatim
