"""Driver-side context (rule catalog) compilation.

Contexts are tiny Turtle-star documents (tens of triples); compiling
them is never distributed. The compiled catalog is broadcast into the
rule-application join (SURVEY.md §2.3 J8).
"""

from .model import PRSCCatalog, PRSCRule, Violation  # noqa: F401
from .quadset import QuadSet  # noqa: F401
