"""payor_linkage — a Ray-Data-native record-linkage / MDM engine.

From-scratch rebuild of the semantics of ``prometheuswilson05/payor-mdm``
(normalize → block → score → threshold → cluster → survive → golden /
xref / hierarchy) expressed as idiomatic Ray Data pipelines over Arrow
batches, designed for 10^12-document scale (explicit blocking-key skew
handling, partial aggregation, broadcast small sides, per-stage
checkpoints), plus the large-scale training-data operators
(deduplication, similarity search, text analysis, multimodal stubs)
under ``payor_linkage.dataops``.
"""

__version__ = "0.1.0"
