"""bern_spark — a from-scratch PySpark-native entity-resolution engine.

Re-expresses the query and data-processing semantics of dmis-lab/bern
(multi-type biomedical entity normalization) as an idiomatic-Spark
record-linkage pipeline over a table of multi-turn transcripts:

    mention extraction (Arrow UDF) -> key normalization (Catalyst exprs)
    -> dictionary broadcast joins -> blocking (token + MinHash-LSH)
    -> salted pairwise scoring self-join -> edge threshold
    -> large-star/small-star connected components -> cluster labels

Nothing is ported from the reference's execution machinery (threaded HTTP
server, socket IPC, TF Estimator); only computed behavior carries over.
Reference citations in docstrings use ``/root/reference/<file>:<line>``.
"""

__version__ = "0.1.0"
