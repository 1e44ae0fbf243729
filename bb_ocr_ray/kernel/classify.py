"""Stage 3: text-block classification (content vs boilerplate).

The analog of the reference's contour area filter + union-bbox keep
decision (``enhanced_extractor.py:287-329``: boxes outside
[1e-4, 0.10] of image area are discarded; survivors union into the
text region).  For web pages the features are the Boilerpipe /
trafilatura-style trio from the north_rule: text density, link
density, tag depth/position — all computed during segmentation.

Rules (ordered, all deterministic, thresholds in ExtractConfig):
  1. structural drop: any ancestor in {nav, header, footer, aside};
  2. link-density drop: link_chars / raw_chars > max_link_density
     (navigation lists, footers, related-links boxes);
  3. length drop: collapsed text shorter than min_block_chars
     (button labels, stray separators).
A block passing all three is content.
"""

from __future__ import annotations

from dataclasses import dataclass

from bb_ocr_ray.config import DEFAULT_EXTRACT, ExtractConfig
from bb_ocr_ray.kernel.segment import RawBlock


@dataclass
class ClassifiedBlock:
    block_id: int
    tag_path: str
    depth: int
    text: str
    text_density: float
    link_density: float
    is_content: bool


def classify_block(blk: RawBlock, cfg: ExtractConfig = DEFAULT_EXTRACT) -> ClassifiedBlock:
    text = blk.finalize()
    n = len(text)
    link_density = blk.link_chars / blk.raw_chars if blk.raw_chars else 0.0
    text_density = n / max(1, blk.n_tags)
    is_content = (
        not blk.ancestor_dropped
        and link_density <= cfg.max_link_density
        and n >= cfg.min_block_chars
    )
    return ClassifiedBlock(
        block_id=blk.block_id,
        tag_path=blk.tag_path,
        depth=blk.depth,
        text=text,
        text_density=text_density,
        link_density=link_density,
        is_content=is_content,
    )


def classify(blocks: list, cfg: ExtractConfig = DEFAULT_EXTRACT) -> list:
    return [classify_block(b, cfg) for b in blocks]
