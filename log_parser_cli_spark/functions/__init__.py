from log_parser_cli_spark.functions.templates import (  # noqa: F401
    anchor_pattern,
    build_regex_from_template,
    extract_variables_from_template,
    infer_regex_for_value,
    normalize_placeholder,
    parse_template_structure,
    slugify,
)
from log_parser_cli_spark.functions.masking import (  # noqa: F401
    MASK_TOKENS,
    mask_word,
    mask_words,
    signature_of_line,
    signature_to_star,
)
