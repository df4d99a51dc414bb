from arrow_experiments_spark.transport.negotiation import (
    ARROW_STREAM_CONTENT_TYPE,
    NotAcceptable,
    choose_content_coding,
    choose_ipc_codec,
    choose_strategy,
    parse_list_header,
)

__all__ = [
    "ARROW_STREAM_CONTENT_TYPE",
    "NotAcceptable",
    "parse_list_header",
    "choose_ipc_codec",
    "choose_content_coding",
    "choose_strategy",
]
