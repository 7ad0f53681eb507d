from .document import (  # noqa: F401
    ContentLayer,
    DLDocument,
    Formatting,
    GroupItem,
    PictureItem,
    TableCellModel,
    TableData,
    TableItem,
    TextItem,
)
