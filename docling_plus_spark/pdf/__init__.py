"""PDF/layout deterministic path.

No native PDF parser ships in this sandbox (pypdfium2/docling-parse
absent), so the engine's contract starts at *parsed page cells* —
SegmentedPdfPage-equivalent rows ``(url, page_no, width, height,
cells:[{index,text,l,t,r,b}])`` (reference:
backend/docling_parse_v4_backend.py:53-75). Everything after that point —
cell merging, layout clustering + postprocessing, reading-order
resolution, caption/footnote binding, cross-page merges, table-structure
decode, assembly and serialization — is reimplemented here and runs as
``applyInPandas`` groups per document.
"""

from .geometry import BBox, PageElement  # noqa: F401
from .reading_order import ReadingOrderResolver  # noqa: F401
from .layout import LayoutPostprocessor, propose_clusters  # noqa: F401
from .cells import merge_horizontal_cells  # noqa: F401
from .otsl import otsl_to_table_data  # noqa: F401
from .assemble import assemble_document, sanitize_text  # noqa: F401
