"""Step library (narrow, batch-fusable ops). See SURVEY.md §2.2-§2.10."""

from datavec_ray.steps.base import Step, WideStep
from datavec_ray.steps.column import (
    AddConstantColumn, DuplicateColumns, KeepColumns, Melt, RemoveColumns,
    RenameColumns, ReorderColumns, RoundColumns,
)
from datavec_ray.steps.math import (
    ConvertToDouble, ConvertToFloat, ConvertToInteger, ConvertToLong,
    ConvertToString, DoubleColumnsMathOp, DoubleMathFunction, DoubleMathOp,
    FloatMathOp, IntegerColumnsMathOp, IntegerMathOp, LongColumnsMathOp,
    LongMathOp, ParseDouble, ReplaceEmptyWithValue, ReplaceInvalidWithValue,
    TimeMathOp,
)
from datavec_ray.steps.string import (
    AppendString, ChangeCase, ConcatenateStringColumns, MapAllStringsExceptList,
    NormalizeText,
    RegexExtract, RegexReplace, RemoveWhiteSpace, ReplaceEmptyString,
    StringListToCategoricalSet,
    StringListToCounts, StringListToIndicator, StringListToIndices, StringMap,
)
from datavec_ray.steps.categorical import (
    CategoricalToInteger, CategoricalToOneHot, IntegerToCategorical,
    IntegerToOneHot, Pivot, StringToCategorical,
)
from datavec_ray.steps.time import DeriveColumnsFromTime, StringToTime
from datavec_ray.steps.ndarray import (
    NDArrayColumnsMathOp, NDArrayDistance, NDArrayMathFunction, NDArrayScalarOp,
)
from datavec_ray.steps.conditional import (
    ConditionFilter, ConditionalCopyValue, ConditionalReplaceValue,
    ConditionalReplaceValueWithDefault, FilterInvalidValues, LambdaStep,
)
from datavec_ray.steps.jsoncol import JsonExtract

__all__ = [n for n in dir() if not n.startswith("_")]
