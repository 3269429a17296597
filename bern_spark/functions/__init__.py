from bern_spark.functions.keys import (  # noqa: F401
    gene_id_root,
    gene_suffix_strip,
    mutation_head,
    species_taxid,
    text_sha224,
    tmchem_key,
)
from bern_spark.functions.text import (  # noqa: F401
    ascii_letter_guard,
    collapse_control_chars,
    preprocess_text,
    truncate_long_words,
)
