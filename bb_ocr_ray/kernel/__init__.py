"""Pure, deterministic extraction kernel: normalize -> segment -> classify -> emit.

No Ray imports here — every function is a plain (bytes|str) -> data
transform so the kernel is unit-testable single-threaded and bit-stable
under distribution (SURVEY.md §7 "Hard parts": byte identity requires a
fully deterministic kernel with explicit traversal order).
"""

from bb_ocr_ray.kernel.extract import extract_page  # noqa: F401
