"""nlp_lib_spark — a PySpark-native knowledge-graph construction engine.

A from-scratch re-expression of the data-processing capabilities of
syeedibnfaiz/NLP-Lib (a single-threaded Java NLP library for PPI-style
relation extraction, gazetteer entity-mention detection and discourse
segmentation) as staged, distributed DataFrame transforms:

    transcripts (conv_id, turn_idx, role, text, tool, ts)
      -> sentences -> tokens -> mentions -> blinded -> domain/pos/deps
      -> candidate pairs -> rule/ML relation classification
      -> (subj, pred, obj) triples -> entity linking -> canonicalization
      -> node/edge tables

Design notes
------------
* Per-turn NLP kernels are pure Python (``nlp_lib_spark.kernels``) and run
  inside Arrow-batched ``mapInPandas``/``applyInPandas`` UDFs — one Arrow
  crossing for the whole annotate->extract chain on the hot path.
* Everything cross-row (conversation windows, dedup, linking, connected
  components, evaluation joins) is plain DataFrame/SQL so Catalyst handles
  pushdown, broadcast and AQE.
* The same kernels power a single-process oracle (``kernels.pipeline``)
  used by the test-suite to verify the distributed pipeline row-for-row.
"""

__version__ = "0.1.0"
