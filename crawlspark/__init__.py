"""crawlspark — a from-scratch, PySpark-native batch-iterative web-crawl
frontier engine with the capabilities of the reference ``sprax/pycrawler``
fetch–parse–extract loop (contract: BASELINE.json; blueprint: SURVEY.md).

Reference note: /root/reference was empty at survey time (SURVEY.md §0), so
behavior derives from the driver-authored BASELINE.json contract plus public
crawler literature (Mercator WWW'99, IRLbot WWW'08, RFC 3986, RFC 9309).
"""

__version__ = "0.1.0"
