# Operator modules register queries on import; see registry._OPERATOR_MODULES.
