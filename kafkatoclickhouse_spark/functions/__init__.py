"""Reusable column-expression builders (all JVM-side, codegen-friendly).

Submodules:
    exact    decimal-exact aggregates whose results are bit-identical
             across engines/partitionings (oracle determinism)
    vector   embedding math over array<float/double> columns
    hashing  shingling + portable (md5-based) hash families for
             MinHash/SimHash — identical in Spark and ANSI-SQL oracles
    textfns  tokenization / text-statistics expressions
"""
