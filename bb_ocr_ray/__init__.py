"""bb_ocr_ray — a Ray-Data-native web-text extraction + data-processing engine.

A from-scratch rebuild of the *computation* of adamnelsonarcher/BB-OCR
(document -> structured text: layout segmentation, region ordering,
text-block classification) re-expressed for Common-Crawl-style web pages
as HTML boilerplate stripping + reading-order block emission, on top of
``ray.data.Dataset`` pipelines (zero-copy Arrow batches, actor pools for
stateful stages, explicit shuffle/skew handling, lineage + resume).

Nothing is ported from the reference: its execution machinery
(FastAPI/threads/semaphores/SSE) is replaced wholesale by the Ray Data
streaming executor.  Reference file:line citations in docstrings point
at the *semantics* being re-expressed, per SURVEY.md.
"""

__version__ = "0.1.0"
