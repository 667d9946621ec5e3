"""DQL frontend: lexer → parser → typed AST → planner → DataFrame.

Reimplements the reference's query language (grammar
/root/reference/src/dql_parser.yrl, lexer src/dql_lexer.xrl) as a thin
Python layer that emits Spark DataFrame plans; Catalyst does the rest
(SURVEY.md §3's lifecycle stages 11-13).
"""

from dqe_spark.dql.parser import parse  # noqa: F401
