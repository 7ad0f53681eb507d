from .backend import HtmlConverter, convert_html  # noqa: F401
