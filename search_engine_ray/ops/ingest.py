"""ES ingest-pipeline processors: a declarative, ordered chain of
field transforms applied to every document as it streams through —
the shape Elasticsearch runs on its ingest nodes before indexing
(reference lineage: ES `PUT _ingest/pipeline` + `processors: [...]`).

Ray-Data-first: the whole chain compiles to ONE map_batches stage;
every processor is an Arrow compute kernel over the batch (no per-row
Python), so a 40-processor pipeline still costs a single pass with no
intermediate materialization. Processors are pure column->column
transforms; unknown processor names fail at compile time, not mid-run.

Supported processors (each a dict with ONE key, ES syntax-alike):
    {"set":       {"field": f, "value": v}}          # constant column
    {"rename":    {"field": f, "target_field": g}}
    {"remove":    {"field": f}}
    {"lowercase": {"field": f}} / {"uppercase": {"field": f}}
    {"trim":      {"field": f}}
    {"gsub":      {"field": f, "pattern": p, "replacement": r}}  # regex
    {"split":     {"field": f, "separator": s, "target_field": g}}
    {"convert":   {"field": f, "type": "integer"|"double"|"string"}}
    {"copy":      {"field": f, "target_field": g}}
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

_TYPES = {"integer": pa.int64(), "double": pa.float64(), "string": pa.string()}


def _compile_one(proc: dict):
    if len(proc) != 1:
        raise ValueError(f"processor must have exactly one key: {proc}")
    (name, args), = proc.items()

    if name == "set":
        f, v = args["field"], args["value"]

        def _f(cols):
            cols[f] = pa.array([v] * _n(cols), _TYPES.get(args.get("type", ""), None) or None)

    elif name == "rename":
        f, g = args["field"], args["target_field"]

        def _f(cols):
            cols[g] = cols.pop(f)

    elif name == "remove":
        f = args["field"]

        def _f(cols):
            cols.pop(f)

    elif name in ("lowercase", "uppercase", "trim"):
        f = args["field"]
        kern = {"lowercase": pc.utf8_lower, "uppercase": pc.utf8_upper, "trim": pc.utf8_trim_whitespace}[name]

        def _f(cols):
            cols[f] = kern(cols[f])

    elif name == "gsub":
        f, p, r = args["field"], args["pattern"], args["replacement"]

        def _f(cols):
            cols[f] = pc.replace_substring_regex(cols[f], pattern=p, replacement=r)

    elif name == "split":
        f, s = args["field"], args["separator"]
        g = args.get("target_field", f)

        def _f(cols):
            cols[g] = pc.split_pattern(cols[f], pattern=s)

    elif name == "convert":
        f, t = args["field"], _TYPES[args["type"]]

        def _f(cols):
            cols[f] = pc.cast(cols[f], t)

    elif name == "copy":
        f, g = args["field"], args["target_field"]

        def _f(cols):
            cols[g] = cols[f]

    else:
        raise ValueError(f"unknown ingest processor {name!r}")
    return _f


def _n(cols) -> int:
    for v in cols.values():
        return len(v)
    return 0


def ingest_pipeline(ds: Dataset, processors: list[dict]) -> Dataset:
    """Apply the processor chain in order to every batch; returns the
    transformed Dataset. Column order of the output follows insertion
    order (originals first, new/renamed fields appended where they
    were created), matching what a SELECT of the same transforms would
    produce."""
    fns = [_compile_one(p) for p in processors]  # fail fast on bad specs

    def _apply(t: pa.Table) -> pa.Table:
        cols = {name: t[name] for name in t.column_names}
        for fn in fns:
            fn(cols)
        return pa.table(cols)

    return ds.map_batches(_apply, batch_format="pyarrow")
