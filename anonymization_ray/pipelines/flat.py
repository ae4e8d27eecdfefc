"""Flat-JSON request pipeline — the reference's `PUT /api/anonymization/flatjson`
surface (S2 lift + S5 output projection) on top of the Ray operators.

Mirrors:
- lift: rows -> typed resources with a global ``counter``; ``type`` may be a
  string, a LIST (the row joins every listed type's anonymization), or
  absent (row passes through untouched); nested maps become object values
  (``FaltJsonService.addDataToFlatModel``, reference FaltJsonService.java:40-93)
- key validation ``^[a-zA-Z_][a-zA-Z0-9_]*$`` (``validateKey``, :267-277)
- output: rows sorted by counter, all values stringified, generalized
  primitives rendered as {min,max} with the "obfuscated" sentinel, a
  ``types`` array (omitted when empty), unconfigured attributes passed
  through stringified, and a ``kpis`` node with k-Anonymity + per-attribute
  nrBuckets (``createFlatJsonOutput``, :101-248)
- ``useAdjustedAttributes=False`` renames anonymized columns back; renamed
  generalized primitives vanish from the flat rows (bucket resources are not
  literals — AnonymizationService.java:159-201 + FaltJsonService.java:131-146).
"""

from __future__ import annotations

import datetime
import re

import pyarrow as pa
import ray.data as rd

from ..config import (
    GENERALIZATION,
    RANDOMIZATION,
    AnonymizationConfig,
)
from .anonymize import anonymize_table

KEY_RE = re.compile(r"^[a-zA-Z_][a-zA-Z0-9_]*$")


class RequestModelError(ValueError):
    """Invalid request payload (reference RequestModelException)."""


def validate_key(key: str) -> None:
    if not KEY_RE.match(key):
        raise RequestModelError(f"Invalid attribute key: {key!r}")


def validate_request(
    *, use_adjusted_attributes: bool, include_original_data: bool
) -> None:
    """useAdjustedAttributes=False requires includeOriginalData=False —
    renamed columns would collide with originals
    (reference dto/AnonymizationFlatJsonRequestDto.java:13-48)."""
    if not use_adjusted_attributes and include_original_data:
        raise RequestModelError(
            "useAdjustedAttributes=false cannot be combined with "
            "includeOriginalData=true"
        )


def _parse_value(v, datatype: str):
    if v is None:
        return None
    if datatype in ("double", "float", "integer", "decimal"):
        return float(v)
    if datatype == "date":
        return datetime.date.fromisoformat(str(v))
    return str(v)


def _fmt(value, ac) -> str:
    if ac is not None and not ac.is_object:
        if ac.datatype in ("double", "float", "integer", "decimal"):
            return repr(float(value))
        if ac.datatype == "date":
            return value.isoformat() if hasattr(value, "isoformat") else str(value)
    return str(value)


def _normalize_rows(rows: list[dict]) -> list[tuple[int, list[str], dict]]:
    norm = []
    for counter, row in enumerate(rows):
        t = row.get("type")
        if t is None:
            types: list[str] = []
        elif isinstance(t, list):
            types = [str(x) for x in t]
        else:
            types = [str(t)]
        attrs = {}
        for k, v in row.items():
            if k == "type":
                continue
            validate_key(str(k))
            if isinstance(v, dict):
                for sk in v:
                    validate_key(str(sk))
            attrs[k] = v
        norm.append((counter, types, attrs))
    return norm


def _build_type_table(
    members: list[tuple[int, dict]],
    attrs_cfg: list,
    *,
    java_compat: bool = False,
    prefix: str = "",
) -> tuple[pa.Table, dict]:
    """member rows of one type -> wide Arrow table + object layout.

    ``java_compat``: add per-attribute ``__jrank_<attr>`` columns — the
    reference's HashMap iteration rank of each row's resource URI
    (``<prefix>object<counter>``, FaltJsonService.java:45) over the
    attribute's non-null rows — used as the sort tie-break so equal values
    order exactly as the reference's entry stream does."""
    cfg_by_attr = {a.attribute: a for a in attrs_cfg}
    recs = []
    for counter, attrs in members:
        rec: dict = {"counter": counter}
        for key, value in attrs.items():
            ac = cfg_by_attr.get(key)
            if isinstance(value, dict):
                rec[f"{key}__present"] = 1
                for sk, sv in value.items():
                    rec[f"{key}__{sk}"] = None if sv is None else str(sv)
            elif ac is not None and not ac.is_object:
                rec[key] = _parse_value(value, ac.datatype)
            else:
                rec[key] = None if value is None else str(value)
        recs.append(rec)

    keys: list[str] = []
    for r in recs:
        for k in r:
            if k not in keys:
                keys.append(k)
    arrays = {}
    for k in keys:
        vals = [r.get(k) for r in recs]
        ac = cfg_by_attr.get(k)
        if ac is not None and not ac.is_object and ac.datatype in ("double", "float", "integer", "decimal"):
            arrays[k] = pa.array(vals, pa.float64())
        elif ac is not None and not ac.is_object and ac.datatype == "date":
            arrays[k] = pa.array(vals, pa.date32())
        elif k == "counter" or k.endswith("__present"):
            arrays[k] = pa.array(vals, pa.int64())
        else:
            arrays[k] = pa.array(
                [None if v is None else str(v) for v in vals], pa.string()
            )
    if java_compat:
        from ..javacompat import java_entry_rank

        for a in attrs_cfg:
            if a.is_object or a.method not in (GENERALIZATION, RANDOMIZATION):
                continue
            idxs = [i for i, r in enumerate(recs) if r.get(a.attribute) is not None]
            if not idxs:
                continue
            uris = [f"{prefix}object{recs[i]['counter']}" for i in idxs]
            ranks = java_entry_rank(uris, full_count=len(recs))
            colv: list[int | None] = [None] * len(recs)
            for pos, i in enumerate(idxs):
                colv[i] = int(ranks[pos])
            arrays[f"__jrank_{a.attribute}"] = pa.array(colv, pa.int64())

    layout = {
        a.attribute: (
            f"{a.attribute}__present",
            [f"{a.attribute}__{lv}" for lv in a.attribute_order],
        )
        for a in attrs_cfg
        if a.is_object
    }
    return pa.table(arrays), layout


def anonymize_flat_request(
    rows: list[dict],
    config: AnonymizationConfig,
    *,
    seed: int = 0,
    calculate_kpi: bool = True,
    include_original_data: bool = False,
    use_adjusted_attributes: bool = True,
    java_compat: bool = False,
    prefix: str = "",
) -> dict:
    """Full flat-JSON request -> {"data": [...], "kpis": {...}}.

    ``java_compat=True``: byte-exact reference replication — Java-LCG
    randomization draws + HashMap-order sort tie-breaks (see javacompat);
    request-scale only. The engine default stays the partition-independent
    Philox stream."""
    validate_request(
        use_adjusted_attributes=use_adjusted_attributes,
        include_original_data=include_original_data,
    )
    norm = _normalize_rows(rows)
    cfg_types = set(config.object_types)
    entries: dict[int, dict] = {c: {} for c, _, _ in norm}
    kpis: dict = {}

    # passthrough: attributes not governed by any of the row's configured
    # types stay as stringified literals (nested maps become blank-node
    # resources — not literals — so they are skipped)
    for counter, types, attrs in norm:
        governed: set[str] = set()
        for t in types:
            if t in cfg_types:
                governed |= {a.attribute for a in config.for_type(t)}
        for k, v in attrs.items():
            if k not in governed and v is not None and not isinstance(v, dict):
                entries[counter][k] = str(v)

    for object_type in config.object_types:
        attrs_cfg = config.for_type(object_type)
        cfg_by_attr = {a.attribute: a for a in attrs_cfg}
        members = [(c, attrs) for c, tys, attrs in norm if object_type in tys]
        if not members:
            if calculate_kpi:
                kpis[f"kpi{object_type}"] = {"k-Anonymity": 0}
            continue
        table, layout = _build_type_table(
            members, attrs_cfg, java_compat=java_compat, prefix=prefix
        )
        res = anonymize_table(
            rd.from_arrow(table),
            config,
            object_type,
            "counter",
            seed=seed,
            calculate_kpi=calculate_kpi,
            include_original=include_original_data,
            use_adjusted_attributes=use_adjusted_attributes,
            object_layout=layout,
            java_compat=java_compat,
        )
        result_rows = res.data.to_pandas().sort_values("counter").to_dict("records")
        bounds = {
            attr: {b["bucket"]: b for b in gres.formatted_bounds()}
            for attr, gres in res.buckets.items()
        }

        for rec in result_rows:
            entry = entries[int(rec["counter"])]
            for col, val in rec.items():
                if col == "counter" or "__" in col:
                    continue
                if val is None or (isinstance(val, float) and val != val):
                    continue
                base = col
                for sfx in ("_masked", "_generalized", "_randomized"):
                    if col.endswith(sfx):
                        base = col[: -len(sfx)]
                        break
                ac = cfg_by_attr.get(base)
                if ac is None:
                    # not governed by THIS type (another type's attribute or
                    # an unconfigured column riding the wide table) — handled
                    # by the global passthrough / its own type's pass
                    continue
                if col.endswith("_generalized") and base in bounds:
                    b = bounds[base].get(int(val))
                    if b is not None:
                        entry[col] = {"min": b["min"], "max": b["max"]}
                    continue
                if (
                    not use_adjusted_attributes
                    and ac is not None
                    and ac.method == GENERALIZATION
                    and not ac.is_object
                    and col == base
                ):
                    # renamed generalized primitive -> bucket resource ->
                    # dropped from the flat literal projection
                    continue
                if ac is not None and (
                    col == f"{base}_randomized"
                    or (
                        not use_adjusted_attributes
                        and ac.method == RANDOMIZATION
                        and col == base
                    )
                ):
                    entry[col] = _fmt(val, ac)
                    continue
                if ac is not None and col == base:
                    entry[col] = _fmt(val, ac)  # original kept (includeOriginalData)
                else:
                    entry[col] = str(val)

        if calculate_kpi:
            node: dict = {"k-Anonymity": int(res.k_anonymity or 0)}
            for info in res.attribute_info:
                node[info["attribute"]] = {
                    "anonymization": info["anonymization"],
                    "nrBuckets": int(info["nrBuckets"]),
                }
            kpis[f"kpi{object_type}"] = node

    data = []
    for counter, types, _ in norm:
        entry = entries[counter]
        if types:
            entry["types"] = list(types)
        data.append(entry)
    result = {"data": data}
    if calculate_kpi:
        result["kpis"] = kpis
    return result
