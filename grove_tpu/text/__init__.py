from . import constants, conversation, tagging, prompts  # noqa: F401
