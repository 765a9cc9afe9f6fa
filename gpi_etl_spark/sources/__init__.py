"""Source connectors.

``fixed_width`` is a genuinely distributed scan (spark.read.text +
substring projections), and ``excel_lake`` distributes the native
``xls``/``xlsx`` parsers over a whole lake of workbook payloads via
``mapInPandas`` / the ``binaryFile`` source. The HTTP/Excel/HTML/JSON/
Places connectors are driver-side by nature (SURVEY.md §2.1): they
fetch small external payloads and hand Spark a DataFrame; each takes an
injectable ``fetch`` callable so tests replay recorded fixtures with no
network.
"""
