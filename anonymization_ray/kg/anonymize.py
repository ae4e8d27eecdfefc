"""The signature anonymization pass applied to the canonicalized triple
stream.

Replicates the reference's triple-level output shape on top of the wide-table
operators:

- generalized literal triples become ``(subj, <pred>_generalized,
  <pred>_<bucketIdx>, iri)`` referencing bucket resources named exactly like
  the reference's (``Generalization.java:74``)
- each bucket resource gets ``rdf:type soya:generalization`` plus
  ``rdfs:min``/``rdfs:max`` literals — except bucket 0's min and the last
  bucket's max, which carry the obfuscation comment
  (``Generalization.java:76-89``)
- masked predicates become ``<pred>_masked "*****"`` (``Masking.java:19-25``)
- original literal triples are deleted (``QueryService.deleteOriginalProperties``)
- non-entity subjects are skolemized to deterministic ``urn:skolem:<hash>``
  IRIs (blank-node skolemization per the north star).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..config import MASK_VALUE
from ..stages.generalization import GeneralizationResult

SOYA_GENERALIZATION = "soya:generalization"
RDFS_MIN = "rdfs:min"
RDFS_MAX = "rdfs:max"
RDFS_COMMENT = "rdfs:comment"
OBFUSCATED_MIN = "For the lower bound the minimum value is obfuscated"
OBFUSCATED_MAX = "For the higher bound the maximum value is obfuscated"


@dataclass(frozen=True)
class TriplePredicateConfig:
    pred: str
    datatype: str  # double|integer|date|dateTime|string
    method: str  # masking|generalization


def bucket_resource_triples(pred: str, res: GeneralizationResult, datatype: str) -> pa.Table:
    """The bucket side-table as triples — vectorized: g grows with k at web
    scale (k=10^7 gives ~5·10^5 buckets, 1.6M rows here), so per-bucket
    Python appends would dominate."""
    from ..stages.codecs import CODECS

    codec = CODECS[res.kind]
    t = res.buckets
    n = t.num_rows
    subj = pc.binary_join_element_wise(
        pa.array([pred] * n, pa.string()),
        pc.cast(pc.cast(t.column("bucket"), pa.int64()), pa.string()),
        "_",
    )

    import numpy as np

    _zeros = pa.array(np.zeros(n, np.int64))

    def _const(v: str) -> pa.Array:
        # take-on-zeros: one C gather instead of a python list of n copies
        return pa.array([v], pa.string()).take(_zeros)

    def _bound(col: str, obfuscated: str, bound_pred: str) -> pa.Table:
        vals = t.column(col)
        is_null = pc.is_null(vals)
        formatted = pc.fill_null(codec.format_array(pc.fill_null(vals, 0)), "")
        return pa.table(
            {
                "subj": subj,
                "pred": pc.if_else(is_null, RDFS_COMMENT, _const(bound_pred)),
                "obj": pc.if_else(is_null, obfuscated, formatted),
                "obj_kind": pc.if_else(is_null, "string", _const(datatype)),
            }
        )

    type_rows = pa.table(
        {
            "subj": subj,
            "pred": _const("rdf:type"),
            "obj": _const(SOYA_GENERALIZATION),
            "obj_kind": _const("iri"),
        }
    )
    return pa.concat_tables(
        [
            type_rows,
            _bound("min", OBFUSCATED_MIN, RDFS_MIN),
            _bound("max", OBFUSCATED_MAX, RDFS_MAX),
        ]
    )


def anonymize_triples(
    triples: rd.Dataset,
    configs: list[TriplePredicateConfig],
    *,
    url_col_present: bool = False,
) -> tuple[rd.Dataset, dict[str, GeneralizationResult]]:
    """Returns (anonymized triple stream, bucket results per predicate).

    ``triples`` must be reusable (materialized upstream) — each generalized
    predicate adds one narrow sort over its literal slice.
    """
    n = sum(1 for c in configs if c.method == "generalization")
    gen_results: dict[str, GeneralizationResult] = {}
    new_streams: list[rd.Dataset] = []
    anonymized_preds = [c.pred for c in configs]

    for cfg in configs:
        if cfg.method == "masking":
            slice_ds = triples.filter(expr=f"pred == '{cfg.pred}'")

            def _mask(batch: pa.Table, p=cfg.pred) -> pa.Table:
                nrows = batch.num_rows
                return pa.table(
                    {
                        "subj": batch.column("subj").combine_chunks(),
                        "pred": pa.array([f"{p}_masked"] * nrows, pa.string()),
                        "obj": pa.array([MASK_VALUE] * nrows, pa.string()),
                        "obj_kind": pa.array(["string"] * nrows, pa.string()),
                    }
                )

            new_streams.append(slice_ds.map_batches(_mask, batch_format="pyarrow"))
            continue

        # generalization over this predicate's literal slice — the bucket of
        # a sorted row is g*rank//k directly, so generalized triples are
        # emitted straight from the sorted narrow blocks (one pass; no
        # re-scan of the triple stream for assignment)
        import ray

        from ..config import calculate_num_buckets
        from ..stages.codecs import CODECS, kind_for_datatype
        from ..util import chunked_ranges, sorted_column

        kind = kind_for_datatype(cfg.datatype)
        codec = CODECS[kind]
        slice_ds = triples.filter(expr=f"pred == '{cfg.pred}'")

        def _narrow(batch: pa.Table, knd=kind) -> pa.Table:
            vals = batch.column("obj")
            if knd == "numeric":
                arr = pc.cast(vals, pa.float64())
            elif knd == "date":
                arr = pc.cast(vals, pa.date32())
            else:
                arr = pc.cast(vals, pa.timestamp("ms"))
            return pa.table({"value": arr, "subj": batch.column("subj").combine_chunks()})

        narrow = slice_ds.map_batches(_narrow, batch_format="pyarrow")
        sc = sorted_column(narrow, "value", "subj", codec.to_numeric)
        k = sc.total
        if k == 0:
            continue
        g = calculate_num_buckets(k, max(n, 1))
        from ..stages.generalization import GeneralizationResult, _boundary_values

        res = GeneralizationResult(
            attribute=cfg.pred, out_col="bucket", g=g, k=k, kind=kind,
            buckets=_boundary_values(sc, g, codec),
        )
        gen_results[cfg.pred] = res

        # LAZY emission: a tiny (start, stop) range table drives a
        # map_batches whose tasks fetch the covering sorted blocks
        # themselves (refs ride in the closure, which also keeps them
        # alive until execution). The previous shape —
        # ``rd.from_arrow_refs([_emit.remote(...)])`` — made the DRIVER
        # ray.get every emitted table to build metadata: ~3.3 s of serial
        # wall at R=2688 that scaled with data, not with cluster width.
        ranges = chunked_ranges(sc.offsets)
        blk_refs = list(sc.refs)
        offs = sc.offsets.copy()
        range_ds = rd.from_arrow(
            pa.table(
                {
                    "start": pa.array([a for a, _ in ranges], pa.int64()),
                    "stop": pa.array([b for _, b in ranges], pa.int64()),
                }
            )
        )

        def _emit_batch(
            batch: pa.Table,
            p=cfg.pred,
            gg=g,
            kk=k,
            refs=blk_refs,
            offsets=offs,
        ) -> pa.Table:
            import numpy as np

            outs = []
            for start, stop in zip(
                batch.column("start").to_pylist(), batch.column("stop").to_pylist()
            ):
                b0 = int(np.searchsorted(offsets, start, side="right") - 1)
                b1 = int(np.searchsorted(offsets, stop, side="left"))
                got = ray.get(refs[b0:b1])
                parts = []
                for bi, t in zip(range(b0, b1), got):
                    lo = int(offsets[bi])
                    s = max(start, lo) - lo
                    ln = min(stop, int(offsets[bi + 1])) - max(start, lo)
                    parts.append(t.slice(s, ln))
                tbl = pa.concat_tables(parts)
                nrows = stop - start
                ranks = np.arange(start, stop, dtype=np.int64)
                buckets = (gg * ranks) // kk
                obj = pc.binary_join_element_wise(
                    pa.array([p]).take(pa.array(np.zeros(nrows, np.int64))),
                    pc.cast(pa.array(buckets, pa.int64()), pa.string()),
                    "_",
                )
                outs.append(
                    pa.table(
                        {
                            "subj": tbl.column("subj").combine_chunks(),
                            "pred": pa.array([f"{p}_generalized"]).take(
                                pa.array(np.zeros(nrows, np.int64))
                            ),
                            "obj": obj,
                            "obj_kind": pa.array(["iri"]).take(
                                pa.array(np.zeros(nrows, np.int64))
                            ),
                        }
                    )
                )
            return pa.concat_tables(outs)

        new_streams.append(
            range_ds.map_batches(_emit_batch, batch_format="pyarrow", batch_size=1)
        )
        # bucket side-table built lazily too — codec formatting of ~3g rows
        # is measurable driver CPU at web-scale g; the tiny buckets table
        # rides the closure instead
        one = rd.from_arrow(pa.table({"i": pa.array([0], pa.int64())}))
        new_streams.append(
            one.map_batches(
                lambda b, p=cfg.pred, r=res, dt=cfg.datatype: bucket_resource_triples(
                    p, r, dt
                ),
                batch_format="pyarrow",
            )
        )

    # delete originals (Q6): drop every anonymized predicate's literal triples
    pred_set = set(anonymized_preds)
    remaining = triples.map_batches(
        lambda b: b.filter(
            pc.invert(pc.is_in(b.column("pred"), value_set=pa.array(sorted(pred_set))))
        ),
        batch_format="pyarrow",
    )
    if url_col_present:
        remaining = remaining.drop_columns(["url"])

    out = remaining
    for s in new_streams:
        out = out.union(s)
    return out, gen_results


def skolemize(triples: rd.Dataset, cols: tuple[str, ...] = ("subj",)) -> rd.Dataset:
    """Deterministic skolem IRIs for non-entity subjects: any value not
    already an IRI-ish node (urn:/http…/suffixed bucket) becomes
    ``urn:skolem:<md5-12>`` — the Ray-native stand-in for the reference's
    blank-node handling (blank nodes cannot cross partition boundaries)."""

    def _apply(batch: pa.Table) -> pa.Table:
        for c in cols:
            col = batch.column(c).combine_chunks()
            # vectorized mask: IRI-ish nodes and suffixed bucket/anonymized
            # names stay; only the (minority) plain-literal slice is hashed
            keep = pc.match_substring_regex(col, r"^(urn:|http|rdf:|soya:)|_")
            keep = pc.fill_null(pc.or_kleene(keep, pc.is_null(col)), True)
            need = pc.invert(keep)
            if pc.sum(pc.cast(need, pa.int64())).as_py() == 0:
                continue
            need_np = need.to_numpy(zero_copy_only=False)
            vals = col.to_numpy(zero_copy_only=False)
            out = vals.copy()
            rows = np.nonzero(need_np)[0]
            # md5 only over DISTINCT flagged values (typically a small
            # vocabulary), then a vectorized searchsorted map-back — no
            # per-row hashing of repeated literals
            uniq, inv = np.unique(vals[rows].astype(object), return_inverse=True)
            digests = np.array(
                ["urn:skolem:" + hashlib.md5(u.encode()).hexdigest()[:12] for u in uniq],
                dtype=object,
            )
            out[rows] = digests[inv]
            idx = batch.column_names.index(c)
            batch = batch.set_column(idx, c, pa.array(out, pa.string()))
        return batch

    return triples.map_batches(_apply, batch_format="pyarrow")
