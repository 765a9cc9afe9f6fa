"""Named jobs: the reference's 13 HTTP entry points re-expressed as
DataFrame-in / DataFrame-out pipelines (HTTP/serving layer out of
scope). Connectors feed them; fixtures replace connectors in tests.
"""
