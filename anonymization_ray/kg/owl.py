"""OWL property-semantics materialization (inverse / symmetric closure).

Web-KG construction ships ontologies that declare ``owl:inverseOf``
(``basedIn`` ⁻¹ = ``hasCustomer``) and ``owl:SymmetricProperty``
(``tradesWith``); downstream BGP queries then expect BOTH directions to
be queryable without runtime rewriting. The standard batch answer is
forward chaining at build time: materialize every implied triple once,
next to the asserted ones (the same place `kg_rdfs_closure` sits; the
transitive case is `kg_path_kleene`'s fixpoint).

Ray shape: the ontology is dimension-sized and rides the closure as a
broadcast dict; ONE stateless ``map_batches`` scan emits the implied
rows (obj pred⁻¹ subj), and set semantics come from the repo's
sort-scan ``distinct_rows`` over a packed key — no per-group aggregate,
no join anywhere. Literal-object triples never invert (RDF forbids
literal subjects; OWL2 restricts inverses to object properties), which
the scan enforces by ``obj_kind``.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..util import distinct_rows


def materialize_property_semantics(
    triples: rd.Dataset,
    *,
    inverse_map: dict[str, str],
    symmetric: tuple[str, ...] | list[str] = (),
) -> rd.Dataset:
    """Asserted (subj, pred, obj, obj_kind) -> closed graph under
    owl:inverseOf + owl:SymmetricProperty, distinct set semantics."""
    inv = dict(inverse_map)
    sym = tuple(symmetric)
    for p in sym:
        if p in inv:
            raise ValueError(
                f"predicate {p!r} declared both symmetric and inverse-mapped"
            )

    def _implied(batch: pa.Table) -> pa.Table:
        p = batch.column("pred")
        is_iri = pc.equal(batch.column("obj_kind"), "iri")
        outs = []
        for src, dst in list(inv.items()) + [(s, s) for s in sym]:
            t = batch.filter(pc.and_(pc.equal(p, src), is_iri))
            if t.num_rows == 0:
                continue
            outs.append(
                pa.table(
                    {
                        "subj": t.column("obj").combine_chunks(),
                        "pred": pa.array([dst] * t.num_rows, pa.string()),
                        "obj": t.column("subj").combine_chunks(),
                        "obj_kind": pa.array(
                            ["iri"] * t.num_rows, pa.string()
                        ),
                    }
                )
            )
        if not outs:
            return batch.schema.empty_table()
        return pa.concat_tables(outs)

    implied = triples.map_batches(_implied, batch_format="pyarrow")
    closed = triples.union(implied)

    # set semantics via ONE packed-key sort-scan distinct; the full quad
    # rides inside the key (distinct_rows projects to its key columns)
    # and unpacks after — one narrow string sort, no join, no aggregate
    def _pack(batch: pa.Table) -> pa.Table:
        k = pc.binary_join_element_wise(
            batch.column("subj"),
            batch.column("pred"),
            batch.column("obj"),
            batch.column("obj_kind"),
            "\x1f",
        )
        return pa.table({"quad": k})

    packed = closed.map_batches(_pack, batch_format="pyarrow")

    def _unpack(batch: pa.Table) -> pa.Table:
        parts = pc.split_pattern(batch.column("quad"), "\x1f")
        return pa.table(
            {
                "subj": pc.list_element(parts, 0),
                "pred": pc.list_element(parts, 1),
                "obj": pc.list_element(parts, 2),
                "obj_kind": pc.list_element(parts, 3),
            }
        )

    return distinct_rows(packed, ["quad"]).map_batches(
        _unpack, batch_format="pyarrow"
    )
