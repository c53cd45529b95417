from . import ast
from .parser import ParseError, Parser, parse
from .tokenizer import Token, TokenizeError, tokenize

__all__ = ["ast", "parse", "Parser", "ParseError", "tokenize", "Token", "TokenizeError"]
