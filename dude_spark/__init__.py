"""dude_spark — a from-scratch PySpark-native crawl/extract engine with the
query and data-processing capabilities of ``roniemartinez/dude``.

Not a port: the reference is a single-process event loop over Python deques;
this engine expresses the same semantics (decorator rule registry, selector
extraction, group scoping, FIFO crawl ordering, robots/politeness, flatten
aggregation, save sinks) as DataFrame jobs over a distributed URL frontier.
See SURVEY.md for the full operator mapping.
"""

from .api import Scraper, app, group, save, select, shutdown, startup
from .crawl import CrawlConfig, CrawlJob, CrawlResult
from .rule import RuleSpec, Selector
from .session import get_spark

__version__ = "0.1.0"
__all__ = [
    "Scraper", "app", "select", "group", "save", "startup", "shutdown",
    "CrawlJob", "CrawlConfig", "CrawlResult", "RuleSpec", "Selector",
    "get_spark",
]
