"""Prompt assembly for function synthesis (G3 —
fast_ai_wrangler/function_generator.py:94-116; templates at
promptsTemplate.py:4-93).

Same *structure* as the reference — a per-task system instruction
naming the required entry point and permitted libraries, a user turn
carrying the task instruction plus serialized demonstrations, and a
retry turn that appends the validation error — with our own wording.
"""

from __future__ import annotations

from collections.abc import Sequence

from efficient_llm_data_wrangling_spark.functions.apply import TASK_ENTRY_POINTS

#: Library surface the generated function may import — mirrors the
#: reference prompt whitelist (promptsTemplate.py:10,38,75) and the
#: sandbox allowlist (functions/sandbox.py).
_LIB_HINT = (
    "re, fractions, math, datetime, calendar, pytz, roman, numpy, "
    "Levenshtein, bs4, geopy, pyproj, mgrs, ummalqura, spellchecker, nltk"
)

_TASK_BRIEFS: dict[str, str] = {
    "data_transformation": (
        "Write a Python function `string_transformation(s: str) -> str` that "
        "maps each input string to its output string, generalizing the "
        "pattern shown in the examples. Return a string and nothing else."
    ),
    "entity_matching": (
        "Write a Python function `input_output_converter(s: str) -> str` "
        "that decides whether the two serialized entities in the input "
        "describe the same real-world object. Use string-similarity "
        "reasoning (token overlap, Jaccard, Levenshtein, cosine) with "
        "thresholds learned from the examples. Return 'Yes' or 'No'."
    ),
    "data_imputation": (
        "Write a Python function `input_output_converter(s: str) -> str` "
        "that infers the missing attribute value from the serialized "
        "attributes in the input, following the examples. Return the value "
        "as a string."
    ),
    "error_detection_spelling": (
        "Write a Python function `detect_error(s: str) -> str` that returns "
        "'yes' if the input value contains a spelling error and 'no' "
        "otherwise, consistent with the examples."
    ),
    # REGEX_GENERATOR variant (promptsTemplate.py:89-93): same
    # string-transformation contract, but the body must be a regex
    # program — pattern + substitution — rather than free-form Python.
    "regex_transformation": (
        "You are an expert regex user. Write a Python function "
        "`string_transformation_regex(s: str) -> str` that converts each "
        "input string to its output string using a regular-expression "
        "pattern (re.sub / re.match groups), generalizing the examples. "
        "The transformation logic must live in the regex, not in "
        "procedural string code. Return a string and nothing else."
    ),
}


def system_prompt(task: str) -> str:
    if task not in _TASK_BRIEFS:
        raise KeyError(f"unknown task {task!r}; expected one of {sorted(_TASK_BRIEFS)}")
    return (
        f"{_TASK_BRIEFS[task]} Only use the Python standard library and: "
        f"{_LIB_HINT}. Define exactly one top-level function named "
        f"`{TASK_ENTRY_POINTS[task]}`. Respond with the code only."
    )


def formulate_prompt(
    task: str,
    instruction: str | None,
    examples: Sequence[tuple[str, str]],
) -> list[dict[str, str]]:
    """G3 — messages for the first synthesis call."""
    lines = []
    if instruction:
        lines.append(f"Task instruction: {instruction}")
    lines.append("Examples (Input => Output):")
    for text, label in examples:
        lines.append(f"Input: {text!r} => Output: {label!r}")
    return [
        {"role": "system", "content": system_prompt(task)},
        {"role": "user", "content": "\n".join(lines)},
    ]


def retry_message(error: str) -> dict[str, str]:
    """The repair turn (TASK_RETRY, promptsTemplate.py:6; appended at
    function_generator.py:225-227)."""
    return {
        "role": "user",
        "content": (
            f"The previous function failed validation: {error}. "
            "Fix the function and respond with the corrected code only."
        ),
    }
