"""Additional declarative format backends (beyond HTML).

Mirrors the reference's format-options registry
(docling/docling/document_converter.py:148-175) as a ``format →
converter`` dispatch consumed by the extraction stage. Backends that need
binary parsers absent in this sandbox (docx/pptx/xlsx/images) are not
implemented; csv and plain-text/markdown are stdlib-parsable and live
here.
"""

from .asciidoc_backend import convert_asciidoc  # noqa: F401
from .csv_backend import convert_csv  # noqa: F401
from .json_backend import convert_docling_json  # noqa: F401
from .md_backend import convert_markdown  # noqa: F401
from .vtt_backend import convert_vtt  # noqa: F401
from .registry import CONVERTERS, convert_bytes  # noqa: F401
