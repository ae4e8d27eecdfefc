"""JSON-LD request pipeline — the reference's `PUT /api/anonymization`
surface: parse JSON-LD -> per-type wide tables -> Ray anonymization ->
output triple set (the whole model re-serialized, reference
AnonymizationService.java:29-47).

Output triples mirror the reference's model shape: bucket resources
``<attr>_<idx>`` (typed soya:generalization, rdfs:min/max literals,
obfuscation comments on the outer bounds), ``<attr>_masked``/``_randomized``
literals, KPI nodes (``soya:kpi<Type>`` with ``soya:kanonymity``;
``soya:anonymizationTyp``/``soya:nrBucketsUsed`` on the property nodes),
original anonymized properties deleted (with their object sub-trees) unless
``include_original_data``.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd

from ..config import (
    GENERALIZATION,
    MASKING,
    RANDOMIZATION,
    AnonymizationConfig,
)
from .anonymize import anonymize_table
from .flat import _parse_value

SOYA = "soya:"
RDF_TYPE = "rdf:type"


def _local(term: str) -> str:
    if term.startswith(("http://", "https://", "urn:")):
        return term.rsplit("#", 1)[-1].rsplit("/", 1)[-1]
    if ":" in term:
        return term.split(":", 1)[1]
    return term


def anonymize_jsonld_request(
    doc: dict | list,
    config: AnonymizationConfig,
    *,
    seed: int = 0,
    calculate_kpi: bool = True,
    include_original_data: bool = False,
    use_adjusted_attributes: bool = True,
    java_compat: bool = False,
) -> pa.Table:
    """JSON-LD document -> anonymized triple table (subj, pred, obj, obj_kind).

    ``java_compat``: byte-exact reference replication (Java-LCG draws +
    HashMap-order tie-breaks over the subject IRIs; see javacompat)."""
    from ..sources.jsonld import parse_jsonld

    t = parse_jsonld(doc)
    subs = t.column("subj").to_pylist()
    preds = t.column("pred").to_pylist()
    objs = t.column("obj").to_pylist()
    kinds = t.column("obj_kind").to_pylist()

    node_props: dict[str, list[tuple[str, str, str]]] = {}
    node_types: dict[str, list[str]] = {}
    for s, p, o, k in zip(subs, preds, objs, kinds):
        if p == RDF_TYPE:
            node_types.setdefault(s, []).append(_local(o))
        node_props.setdefault(s, []).append((p, o, k))

    out_rows: list[tuple[str, str, str, str]] = []
    consumed: set[tuple[str, str]] = set()  # (subj, pred-local) handled
    deleted_nodes: set[str] = set()  # object nodes whose sub-trees are removed

    for object_type in config.object_types:
        attrs_cfg = config.for_type(object_type)
        cfg_by_attr = {a.attribute: a for a in attrs_cfg}
        members = sorted(
            s for s, tys in node_types.items() if object_type in tys
        )
        if not members:
            continue
        # wide record per member subject
        recs = []
        for s in members:
            rec: dict = {"subj": s}
            for p, o, k in node_props.get(s, []):
                pl = _local(p)
                ac = cfg_by_attr.get(pl)
                if ac is None or p == RDF_TYPE:
                    continue
                if ac.is_object:
                    rec[f"{pl}__present"] = 1
                    rec[f"{pl}__node"] = o
                    for sp, so, sk in node_props.get(o, []):
                        if sk != "iri":
                            rec[f"{pl}__{_local(sp)}"] = so
                else:
                    rec[pl] = _parse_value(o, ac.datatype)
            recs.append(rec)

        keys: list[str] = []
        for r in recs:
            for kname in r:
                if kname not in keys:
                    keys.append(kname)
        arrays = {}
        for kname in keys:
            vals = [r.get(kname) for r in recs]
            ac = cfg_by_attr.get(kname)
            if ac is not None and not ac.is_object and ac.datatype in (
                "double", "float", "integer", "decimal"
            ):
                arrays[kname] = pa.array(vals, pa.float64())
            elif ac is not None and not ac.is_object and ac.datatype == "date":
                arrays[kname] = pa.array(vals, pa.date32())
            elif kname.endswith("__present"):
                arrays[kname] = pa.array(vals, pa.int64())
            else:
                arrays[kname] = pa.array(
                    [None if v is None else str(v) for v in vals], pa.string()
                )
        if java_compat:
            from ..javacompat import java_entry_rank

            # Jena hashes the EXPANDED resource IRI — expand compact
            # prefix:local subjects through the document's @context
            ctx = doc.get("@context") if isinstance(doc, dict) else None
            ctx = ctx if isinstance(ctx, dict) else {}

            def _expand(term: str) -> str:
                if ":" in term and not term.startswith(("http://", "https://", "urn:")):
                    pfx, rest = term.split(":", 1)
                    base = ctx.get(pfx)
                    if isinstance(base, str):
                        return base + rest
                return term

            for a in attrs_cfg:
                if a.is_object or a.method not in (GENERALIZATION, RANDOMIZATION):
                    continue
                idxs = [i for i, r in enumerate(recs) if r.get(a.attribute) is not None]
                if not idxs:
                    continue
                ranks = java_entry_rank(
                    [_expand(recs[i]["subj"]) for i in idxs], full_count=len(recs)
                )
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
        res = anonymize_table(
            rd.from_arrow(pa.table(arrays)),
            config,
            object_type,
            "subj",
            seed=seed,
            calculate_kpi=calculate_kpi,
            include_original=include_original_data,
            use_adjusted_attributes=use_adjusted_attributes,
            object_layout=layout,
            java_compat=java_compat,
        )
        result = res.data.to_pandas().sort_values("subj").to_dict("records")

        def emit(s, p, o, k="string"):
            out_rows.append((s, p, o, k))

        for rec in result:
            s = rec["subj"]
            for col, val in rec.items():
                if col == "subj" or "__" in col:
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
                    continue
                out_name = col if use_adjusted_attributes else base
                renamed_output = (not use_adjusted_attributes) and col == base
                if col.endswith("_generalized") and base in res.buckets:
                    emit(s, out_name, f"{base}_{int(val)}", "iri")
                elif col.endswith("_generalized"):
                    emit(s, out_name, str(val))  # object generalization literal
                elif col.endswith("_masked"):
                    emit(s, out_name, "*****")
                elif col.endswith("_randomized"):
                    if ac.datatype == "date":
                        emit(s, out_name, val.isoformat() if hasattr(val, "isoformat") else str(val), "date")
                    else:
                        emit(s, out_name, repr(float(val)), "double")
                elif renamed_output:
                    # use_adjusted_attributes=False: the anonymized column was
                    # renamed back to the original attribute name upstream
                    if ac.method == GENERALIZATION and base in res.buckets:
                        emit(s, out_name, f"{base}_{int(val)}", "iri")
                    elif ac.method == GENERALIZATION:
                        emit(s, out_name, str(val))
                    elif ac.method == MASKING:
                        emit(s, out_name, "*****")
                    elif ac.method == RANDOMIZATION:
                        if ac.datatype == "date":
                            emit(s, out_name, val.isoformat() if hasattr(val, "isoformat") else str(val), "date")
                        else:
                            emit(s, out_name, repr(float(val)), "double")
                elif col == base and include_original_data:
                    pass  # original kept below via passthrough
            # mark originals consumed (deleted unless include_original)
            for a in attrs_cfg:
                consumed.add((s, a.attribute))
                if a.is_object and not include_original_data:
                    node = rec.get(f"{a.attribute}__node")
                    if node:
                        deleted_nodes.add(node)

        # bucket resource nodes
        for attr, gres in res.buckets.items():
            from ..kg.anonymize import bucket_resource_triples

            bt = bucket_resource_triples(attr, gres, cfg_by_attr[attr].datatype)
            for s, p, o, k in zip(
                bt.column("subj").to_pylist(),
                bt.column("pred").to_pylist(),
                bt.column("obj").to_pylist(),
                bt.column("obj_kind").to_pylist(),
            ):
                out_rows.append((s, p, o, k))

        if calculate_kpi:
            kpi = f"{SOYA}kpi{object_type}"
            emit(kpi, f"{SOYA}kanonymity", str(int(res.k_anonymity or 0)), "long")
            for info in res.attribute_info:
                emit(kpi, f"{SOYA}hasAttribute", info["attribute"], "iri")
                emit(info["attribute"], f"{SOYA}anonymizationTyp", info["anonymization"])
                emit(info["attribute"], f"{SOYA}nrBucketsUsed", str(int(info["nrBuckets"])), "long")

    # passthrough: every original triple not consumed and not under a deleted
    # object node (the reference keeps the rest of the model verbatim)
    for s, p, o, k in zip(subs, preds, objs, kinds):
        pl = _local(p)
        if s in deleted_nodes:
            continue
        if (s, pl) in consumed:
            keep = include_original_data and p != RDF_TYPE
            if not keep:
                if p != RDF_TYPE:
                    continue
        out_rows.append((s, p, o, k))

    s, p, o, k = zip(*out_rows) if out_rows else ([], [], [], [])
    return pa.table(
        {
            "subj": pa.array(list(s), pa.string()),
            "pred": pa.array(list(p), pa.string()),
            "obj": pa.array(list(o), pa.string()),
            "obj_kind": pa.array(list(k), pa.string()),
        }
    )
