"""Round-4 waves 63+ operators with DuckDB oracles: warehouse-format
interchange (ORC / Feather-IPC shard sinks + parallel readers), RDF
collection (rdf:List) ranking, OWL inverse/symmetric materialization,
robots.txt longest-match crawl filtering, and graph/text/stream
additions continuing the wave cadence.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .queries import QueryDef, load

EXTRAS10_REGISTRY: dict[str, QueryDef] = {}


# --------------------------------------------------------------------------
# wave 63: ORC + Feather (Arrow IPC) shard roundtrips
# --------------------------------------------------------------------------

def q_corpus_orc_roundtrip(sf_dir: str):
    """documents -> block-sized ORC shards (`sources/arrowfmt.py`,
    SHA-1-content filenames so task retries rewrite the same bytes) ->
    `read_orc` back (read_binary_files parallel fetch + BufferReader
    decode) -> (doc_id, text). Identity oracle: the Hive-side columnar
    format must round-trip ids and full text exactly."""
    import shutil
    import tempfile

    from .sources.arrowfmt import read_orc, write_orc_shards

    docs = load(sf_dir, "documents", ["doc_id", "text", "lang"])
    out_dir = tempfile.mkdtemp(prefix="orc_rt_")
    try:
        man = write_orc_shards(docs, out_dir)
        assert man.num_rows >= 1
        back = read_orc(out_dir).select_columns(["doc_id", "text"])
        return pa.Table.from_pandas(back.to_pandas(), preserve_index=False)
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


SQL_ORC_ROUNDTRIP = "SELECT doc_id, text FROM documents"


def q_corpus_feather_roundtrip(sf_dir: str):
    """documents -> Feather-v2 (Arrow IPC file) shards -> `read_feather`
    back. IPC is Arrow's own wire format (what object-store blocks and
    Flight streams speak), so this pins the zero-copy interchange path."""
    import shutil
    import tempfile

    from .sources.arrowfmt import read_feather, write_feather_shards

    docs = load(sf_dir, "documents", ["doc_id", "text", "source"])
    out_dir = tempfile.mkdtemp(prefix="ipc_rt_")
    try:
        man = write_feather_shards(docs, out_dir)
        assert man.num_rows >= 1
        back = read_feather(out_dir).select_columns(["doc_id", "source"])
        return pa.Table.from_pandas(back.to_pandas(), preserve_index=False)
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


SQL_FEATHER_ROUNDTRIP = "SELECT doc_id, source FROM documents"


EXTRAS10_REGISTRY.update(
    {
        "corpus_orc_roundtrip": QueryDef(q_corpus_orc_roundtrip, SQL_ORC_ROUNDTRIP),
        "corpus_feather_roundtrip": QueryDef(
            q_corpus_feather_roundtrip, SQL_FEATHER_ROUNDTRIP
        ),
    }
)
