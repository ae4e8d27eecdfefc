"""Anonymization orchestrator — per-object-type pipeline over a wide table.

Mirrors ``AnonymizationService.applyAnonymizationForObject``
(reference ``service/AnonymizationService.java:74-116``):

1. probe used attributes (>=1 non-null instance; reference
   ``QueryService.java:139-156``)
2. n = #generalization+randomization attributes among those present
   (``AnonymizationService.java:128-137``)
3. run each attribute's anonymizer, adding the suffixed column
4. KPIs: attribute info (not for masking — ``Masking`` never sets
   calculateKpi) + k-anonymity over equivalence classes ∩ similarity sets
5. drop originals unless ``include_original``
   (``QueryService.deleteOriginalProperties``; for object attributes the
   hierarchy sub-columns are dropped too — the reference deletes the object
   node's sub-triples)
6. when ``use_adjusted_attributes`` is False, rename suffixed -> original
   (``AnonymizationService.java:159-201``).

A multi-type request is a driver loop: filter rows per type (or pass one
table per type) and call this once per type, as the reference loops over
``anonymizationObjects``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyarrow as pa
import ray.data

from ..config import (
    GENERALIZATION,
    MASKING,
    RANDOMIZATION,
    SUFFIX,
    AnonymizationConfig,
)
from ..stages.codecs import kind_for_datatype
from ..stages.generalization import GeneralizationResult, generalize_column
from ..stages.generalization_object import (
    ObjectGeneralizationResult,
    generalize_object_column,
)
from ..stages.kpi import RandomizedAttr, compute_benchmarks, k_anonymity
from ..stages.masking import mask_column
from ..stages.randomization import randomize_column


@dataclass
class AnonymizeResult:
    data: ray.data.Dataset
    object_type: str
    n_attrs: int
    attribute_info: list[dict] = field(default_factory=list)  # K1 rows
    buckets: dict[str, GeneralizationResult] = field(default_factory=dict)
    object_gen: dict[str, ObjectGeneralizationResult] = field(default_factory=dict)
    k_anonymity: int | None = None


def _nonnull_counts(ds: ray.data.Dataset, cols: list[str]) -> dict[str, int]:
    """One streaming pass: per-column non-null counts (Q2 presence probe)."""
    if not cols:
        return {}

    # a configured attribute absent from the schema is simply "unused"
    # (the reference's EXISTS probe binds nothing, QueryService.java:139-156)
    schema_names = set(ds.schema().names)
    missing = [c for c in cols if c not in schema_names]
    cols = [c for c in cols if c in schema_names]
    out = {c: 0 for c in missing}
    if not cols:
        return out

    def _partial(batch: pa.Table) -> pa.Table:
        return pa.table(
            {c: pa.array([batch.num_rows - batch.column(c).null_count], pa.int64()) for c in cols}
        )

    parts = ds.map_batches(_partial, batch_format="pyarrow")
    sums = parts.sum(cols)
    if isinstance(sums, dict):
        out.update({c: int(sums[f"sum({c})"] or 0) for c in cols})
    else:
        out[cols[0]] = int(sums or 0)
    return out


def anonymize_table(
    ds: ray.data.Dataset,
    config: AnonymizationConfig,
    object_type: str,
    id_col: str,
    *,
    seed: int = 0,
    calculate_kpi: bool = True,
    include_original: bool = False,
    use_adjusted_attributes: bool = True,
    object_layout: dict[str, tuple[str | None, list[str]]] | None = None,
    num_partitions: int | None = None,
    java_compat: bool = False,
) -> AnonymizeResult:
    """Anonymize one object type's wide table.

    ``object_layout`` maps an object-valued attribute name to
    ``(presence_col, [level_cols lowest-first])`` — the flattened form of the
    reference's nested objects (e.g. the ``adresse`` struct).

    ``java_compat=True`` (conformance mode, request-scale): sort ties break
    in the reference's HashMap iteration order via per-attribute
    ``__jrank_<attr>`` columns (built by the flat pipeline from
    ``javacompat.java_entry_rank``) and randomization replays the exact
    ``java.util.Random(seed)`` stream — byte-exact vs the reference goldens.
    """
    attrs = config.for_type(object_type)
    object_layout = object_layout or {}
    # the presence probe, each per-attribute narrow sort, and the KPI passes
    # all consume ``ds`` — materialize once so the upstream (reads, joins,
    # feature stages) doesn't re-execute per pass; blocks live in the object
    # store and spill under pressure
    ds = ds.materialize()

    # --- presence probe (Q2) --------------------------------------------
    probe_cols: dict[str, str] = {}
    for a in attrs:
        if a.is_object:
            pres, levels = object_layout.get(a.attribute, (None, []))
            probe_cols[a.attribute] = pres or (levels[0] if levels else a.attribute)
        else:
            probe_cols[a.attribute] = a.attribute
    counts = _nonnull_counts(ds, sorted(set(probe_cols.values())))
    present = {a.attribute for a in attrs if counts.get(probe_cols[a.attribute], 0) > 0}
    attrs = [a for a in attrs if a.attribute in present]
    n = sum(1 for a in attrs if a.counts_for_buckets)

    result = AnonymizeResult(data=ds, object_type=object_type, n_attrs=n)
    gen_cols: list[str] = []
    rand_attrs: list[RandomizedAttr] = []

    schema_names = set(ds.schema().names)

    def _tie_id(attr: str) -> str:
        """Java-order tie-break column when present (conformance mode)."""
        jc = f"__jrank_{attr}"
        return jc if java_compat and jc in schema_names else id_col

    # --- per-attribute anonymizers --------------------------------------
    for a in attrs:
        if a.method == MASKING:
            ds = mask_column(ds, a.attribute)
            # Masking never registers attribute KPIs (5-arg ctor, reference
            # Masking.java:10-17 -> calculateKpi stays false)
        elif a.is_object:
            pres, levels = object_layout[a.attribute]
            ds, ores = generalize_object_column(
                ds, a.attribute, list(levels), num_attrs=n, presence_col=pres,
            )
            result.object_gen[a.attribute] = ores
            gen_cols.append(ores.out_col)
            if calculate_kpi:
                result.attribute_info.append(
                    {"attribute": a.attribute, "anonymization": GENERALIZATION, "nrBuckets": ores.g}
                )
        elif a.method == GENERALIZATION:
            ds, gres = generalize_column(
                ds, a.attribute, _tie_id(a.attribute), num_attrs=n,
                kind=kind_for_datatype(a.datatype),
            )
            result.buckets[a.attribute] = gres
            gen_cols.append(gres.out_col)
            if calculate_kpi:
                result.attribute_info.append(
                    {"attribute": a.attribute, "anonymization": GENERALIZATION, "nrBuckets": gres.g}
                )
        elif a.method == RANDOMIZATION:
            kind = kind_for_datatype(a.datatype)
            ds = randomize_column(
                ds,
                a.attribute,
                _tie_id(a.attribute),
                num_attrs=n,
                kind=kind,
                seed=seed,
                object_type=object_type,
                num_partitions=num_partitions,
                rng_mode="java_lcg" if java_compat else "philox",
            )
            rand_attrs.append(
                RandomizedAttr(a.attribute, f"{a.attribute}_randomized", kind)
            )
            if calculate_kpi:
                # nrBuckets for randomization = g for this attribute's k
                from ..config import calculate_num_buckets

                k_attr = counts.get(a.attribute, 0)
                result.attribute_info.append(
                    {
                        "attribute": a.attribute,
                        "anonymization": RANDOMIZATION,
                        "nrBuckets": calculate_num_buckets(k_attr, n),
                    }
                )

    # --- KPIs (before dropping originals: K3 needs orig+randomized) ------
    if calculate_kpi:
        rand_attrs = compute_benchmarks(ds, rand_attrs)
        result.k_anonymity = k_anonymity(ds, gen_cols, rand_attrs)

    # --- drop originals (Q6) ---------------------------------------------
    if not include_original:
        drop = []
        for a in attrs:
            if a.is_object:
                pres, levels = object_layout[a.attribute]
                drop.extend([c for c in ([pres] if pres else []) + list(levels)])
            else:
                drop.append(a.attribute)
        drop = [c for c in dict.fromkeys(drop) if c in (ds.schema().names)]
        if drop:
            ds = ds.drop_columns(drop)

    # --- rename suffixed -> original (Q7) --------------------------------
    if not use_adjusted_attributes:
        renames = {}
        for a in attrs:
            sfx_col = f"{a.attribute}{SUFFIX[a.method]}"
            renames[sfx_col] = a.attribute
        names = ds.schema().names
        renames = {k: v for k, v in renames.items() if k in names and v not in names}
        if renames:
            ds = ds.rename_columns(renames)

    result.data = ds
    return result
