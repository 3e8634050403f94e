"""Reusable operator implementations (SURVEY.md §2.B custom compositions).

Each module composes built-in DataFrame ops; Python/Pandas UDFs appear only
where expressions genuinely cannot (multimodal decode stubs). The policy
(SURVEY.md §2.B "UDF surface") is: built-in expressions > Pandas UDF > never
row-at-a-time Python UDFs on hot paths.
"""
