"""Golden synthesized-function fixtures (SURVEY §5: deterministic
offline stubs so the apply/score machinery is tested exactly, without
network access).

Each source is what a successful synthesis episode would produce for
the given task on the synthetic tables. They run inside the sandbox
(allowlisted imports only) and are also served by OfflineStubClient in
tests of the compiler loop.
"""

GOLDEN_DATE_REFORMAT = '''
import datetime

def string_transformation(s):
    """Reformat 'YYYY-MM-DD HH:MM:SS' to 'Mon DD, YYYY' (e.g. 'Jan 15, 1997')."""
    dt = datetime.datetime.strptime(s.strip(), "%Y-%m-%d %H:%M:%S")
    return dt.strftime("%b %d, %Y")
'''

GOLDEN_ENTITY_MATCH_JACCARD = '''
def input_output_converter(s):
    """Decide whether the two ' @@ '-separated texts describe the same
    document: token-set Jaccard similarity >= 0.5 -> Yes."""
    left, _, right = s.partition(" @@ ")
    a = set(left.split())
    b = set(right.split())
    if not a and not b:
        return "Yes"
    union = a | b
    if not union:
        return "No"
    jac = len(a & b) / len(union)
    return "Yes" if jac >= 0.5 else "No"
'''

GOLDEN_DETECT_ERROR = '''
import re

def detect_error(s):
    """'yes' when the value contains a digit-bearing token or an
    over-long token (>15 chars), else 'no'."""
    for token in s.split():
        if re.search(r"[0-9]", token) or len(token) > 15:
            return "yes"
    return "no"
'''

GOLDEN_IMPUTE_PRIORITY = '''
def input_output_converter(s):
    """Impute the priority word from a serialized row containing
    'o_orderpriority: <n>-<WORD>'."""
    marker = "o_orderpriority: "
    start = s.find(marker)
    if start < 0:
        return ""
    value = s[start + len(marker):].split(" ^ ")[0]
    return value.split("-", 1)[1].strip() if "-" in value else value.strip()
'''

GOLDEN_REGEX_DATE = r'''
import re

def string_transformation_regex(s):
    """Regex-only reformat: 'YYYY-MM-DD HH:MM:SS' -> 'MM/DD/YYYY'
    (REGEX_GENERATOR variant: the logic IS the pattern)."""
    return re.sub(
        r"^\s*(\d{4})-(\d{2})-(\d{2})\s+\d{2}:\d{2}:\d{2}\s*$",
        r"\2/\3/\1",
        s,
    )
'''

#: task → golden source, for OfflineStubClient-driven compiler tests.
GOLDEN_BY_TASK = {
    "data_transformation": GOLDEN_DATE_REFORMAT,
    "entity_matching": GOLDEN_ENTITY_MATCH_JACCARD,
    "error_detection_spelling": GOLDEN_DETECT_ERROR,
    "data_imputation": GOLDEN_IMPUTE_PRIORITY,
    "regex_transformation": GOLDEN_REGEX_DATE,
}
