"""anonymization_ray — a Ray-Data-native KG-construction + anonymization engine.

A from-scratch rebuild of the query/data-processing capabilities of the
OwnYourData Anonymization service (reference: Spring Boot + Apache Jena, see
/root/reference) re-expressed on ``ray.data.Dataset`` pipelines:

- config-driven column anonymization (masking, generalization, randomization,
  object generalization) with k-anonymity KPIs
  (reference semantics: service/anonymizer/*.java, service/KpiService.java)
- a web-scale knowledge-graph construction front-end over Parquet web-page
  tables: text extraction -> mention/triple extraction -> entity linking ->
  canonicalization -> anonymization -> sorted triple materialization
- training-data utilities: dedup (exact / minhash-LSH / simhash / jaccard /
  embedding), similarity search, text analysis, multimodal plumbing.

Nothing in this package calls ``ray.init``/``ray.shutdown`` — sessions are
owned by the caller (tests, bench.py, the driver).
"""

__version__ = "0.1.0"
