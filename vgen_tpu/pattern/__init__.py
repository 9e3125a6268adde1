from vgen_tpu.pattern.pattern import DeviceDFA, Pattern
from vgen_tpu.pattern.redfa import DFA, RegexError, compile_dfa

__all__ = ["Pattern", "DeviceDFA", "DFA", "RegexError", "compile_dfa"]
