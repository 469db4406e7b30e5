from .generator import SOURCES, TOKEN_SCHEMA, gen_doc, gen_pandas, token_table, write_token_table  # noqa: F401
