"""Docling-JSON → DLDocument (SURVEY §2.1 S9, docling-JSON).

Reference: docling/docling/backend/json/docling_json_backend.py — a
backend that re-ingests previously exported DoclingDocument JSON via
``DoclingDocument.model_validate_json``. Here the loader is
:meth:`DLDocument.from_dict`; the round trip
``convert_docling_json(doc.export_to_json().encode())`` is
byte-identical (verified against all reference HTML groundtruth .json
fixtures in tests/test_formats.py).
"""

from __future__ import annotations

import json

from docling_plus_spark.doc.document import DLDocument


def convert_docling_json(
    data: bytes, name: str = "file", filename: str = "file.json"
) -> DLDocument:
    obj = json.loads(data.decode("utf-8"))
    return DLDocument.from_dict(obj)
