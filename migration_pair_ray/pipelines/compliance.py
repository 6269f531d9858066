"""Schema compliance gate — the M5 analog (``Tasks/EndToEnd.cs:51-85``).

The reference's check is an O(n²) nested-loop name+type match that aborts on
any difference (and is blind to duplicate-name double counting, ``:64-75``).
Here it is a set/dict comparison with two policies:

* "strict": exact column name+type equality both ways (reference parity);
* "evolve": source may ADD columns (they evolve the lake, backfilled null on
  old rows) and may OMIT columns (backfilled null on new rows); a same-name
  column whose types cannot be unified aborts.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyarrow as pa


@dataclass
class ComplianceReport:
    compliant: bool
    mode: str
    added: list[str] = field(default_factory=list)       # in source, not target
    missing: list[str] = field(default_factory=list)     # in target, not source
    mismatched: list[str] = field(default_factory=list)  # same name, incompatible type
    # reference parity: count of source columns without a target match
    # (Tasks/EndToEnd.cs:82)
    mismatch_count: int = 0


def _convertible(src: pa.DataType, tgt: pa.DataType) -> bool:
    """True when the normalize stage can cast src → tgt: the engine's
    conversion surface = the reference's DynamicTypeConverter semantics
    (string → {int, bool, ts, ...}; unix-ms int ↔ timestamp) plus Arrow's
    permissive schema promotion (numeric widening etc.)."""
    if pa.types.is_string(src) or pa.types.is_large_string(src):
        return True
    if pa.types.is_integer(src) and pa.types.is_timestamp(tgt):
        return True  # unix epoch ms wire form (Extraction.cs:67-68)
    if pa.types.is_timestamp(src) and pa.types.is_integer(tgt):
        return True
    try:
        pa.unify_schemas(
            [pa.schema([pa.field("c", src)]), pa.schema([pa.field("c", tgt)])],
            promote_options="permissive",
        )
        return True
    except (pa.lib.ArrowInvalid, pa.lib.ArrowTypeError):
        return False


def schema_history(cfg) -> list[dict]:
    """The lake's schema-evolution audit log, reconstructed from the pass
    checkpoints' recorded unified schemas (replay stamps one per pass):
    one entry per pass in commit order with the columns it added, dropped
    from its change files, or retyped relative to the previous pass.
    Passes from before schema stamping report ``schema: None``."""
    from migration_pair_ray.state.manifest import CheckpointStore
    store = CheckpointStore(cfg.checkpoint_dir)
    recs = []
    from pathlib import Path
    import json
    for p in sorted(Path(store.dir).glob("pass-*.json")):
        with open(p) as f:
            recs.append(json.load(f))
    recs.sort(key=lambda r: r.get("seq", -1))
    out: list[dict] = []
    prev: dict | None = None
    for r in recs:
        schema = (r.get("stats") or {}).get("schema")
        entry = {"pass_id": r["pass_id"], "seq": r.get("seq"),
                 "schema": schema, "added": [], "removed": [], "retyped": []}
        if schema is not None and prev is not None:
            entry["added"] = sorted(set(schema) - set(prev))
            entry["removed"] = sorted(set(prev) - set(schema))
            entry["retyped"] = sorted(
                f"{c}: {prev[c]} -> {schema[c]}"
                for c in set(schema) & set(prev) if schema[c] != prev[c])
        if schema is not None:
            prev = schema
        out.append(entry)
    return out


def check_compliance(source: pa.Schema, target: pa.Schema,
                     mode: str = "evolve") -> ComplianceReport:
    src = {f.name: f.type for f in source}
    tgt = {f.name: f.type for f in target}
    added = sorted(set(src) - set(tgt))
    missing = sorted(set(tgt) - set(src))
    mismatched = []
    for name in sorted(set(src) & set(tgt)):
        if src[name] == tgt[name]:
            continue
        if mode == "strict":
            mismatched.append(name)
        elif not _convertible(src[name], tgt[name]):
            mismatched.append(name)

    if mode == "strict":
        compliant = not added and not missing and not mismatched
    else:
        compliant = not mismatched
    return ComplianceReport(
        compliant=compliant, mode=mode, added=added, missing=missing,
        mismatched=mismatched,
        mismatch_count=len(added) + len(mismatched),
    )
