"""String-formula parser producing mean-function ASTs.

Parity re-implementation of ``mogp_emulator/formula.py``: tokenizer
(``formula.py:279-354``) -> shunting-yard infix-to-RPN conversion
(``formula.py:354-419``) -> RPN evaluation to ``MeanBase`` trees
(``formula.py:420-495``).  Conventions: numeric literals become
``ConstantMean``, ``x[i]`` / ``inputs[i]`` become ``LinearMean(i)``, any
other identifier becomes a free ``Coefficient``; ``I(...)`` is the
identity; ``+ * ^`` (also ``**``) and function-call composition are the
operators.  Patsy is not used -- the native parser covers the same
surface (``mean_from_patsy_formula`` is an alias).
"""

from . import meanfunction as MeanFunction

__all__ = ["mean_from_string", "mean_from_patsy_formula"]


def mean_from_string(formula, inputdict={}):
    """Create a mean function from a string formula (``formula.py:87-150``)."""
    assert isinstance(formula, str)
    tokens = _tokenize_string(formula)
    eval_stack = _parse_tokens(tokens)
    mf = _eval_parsed_tokens(eval_stack, inputdict)
    assert issubclass(type(mf), MeanFunction.MeanBase)
    return mf


def mean_from_patsy_formula(formula, inputdict={}):
    """Alias for ``mean_from_string`` (the native parser covers the patsy
    surface used by the reference, ``formula.py:8-86``)."""
    if not isinstance(formula, str):
        raise TypeError("formula must be a string")
    return mean_from_string(formula, inputdict)


def _convert_token(token, inputdict={}):
    """Alias substitution (``formula.py:188-220``)."""
    assert isinstance(token, str), "formula input to mean function is not a string"
    if token[:6] == "inputs":
        return "x" + token[6:]
    if token in inputdict:
        return "x[{}]".format(inputdict[token])
    return token


def _is_float(val):
    try:
        float(val)
    except ValueError:
        return False
    return True


def _token_to_mean(token, inputdict={}):
    """Token -> mean-function object (``formula.py:228-277``)."""
    assert isinstance(token, str), "formula input to mean function is not a string"
    if _is_float(token):
        return MeanFunction.ConstantMean(float(token))
    token = _convert_token(token, inputdict)
    if not token[0] == "x":
        return MeanFunction.Coefficient()
    if not (token[:2] == "x[" and token[-1] == "]"):
        raise ValueError("bad formula input in mean function")
    try:
        index = int(token[2:-1])
    except ValueError:
        raise ValueError("index in parsed formula is not an integer")
    assert index >= 0, "index in formula parsing must be non-negative"
    return MeanFunction.LinearMean(index)


def _tokenize_string(formula):
    """Split a formula string into tokens (``formula.py:279-354``)."""
    assert isinstance(formula, str)

    token_list = []
    accumulated = ""
    for char in formula:
        if char in ["(", ")", "+", "^", " ", "[", "]", "=", "~"]:
            if accumulated != "":
                token_list.append(accumulated)
            token_list.append(char)
            accumulated = ""
        elif char == "*":
            if accumulated == "*":
                token_list.append("^")
                accumulated = ""
            elif accumulated != "":
                token_list.append(accumulated)
                accumulated = "*"
            else:
                accumulated = "*"
        else:
            if accumulated == "*":
                token_list.append(accumulated)
                accumulated = ""
            accumulated += char
    if accumulated != "":
        token_list.append(accumulated)

    outlist = []
    for item in token_list:
        if item not in [" ", "[", "]"]:
            outlist.append(item)
        elif item == "[":
            outlist.append(outlist.pop() + item)
        elif item == "]":
            if len(outlist) < 2:
                raise SyntaxError("error in using square brackets in formula input")
            outlist.append(outlist.pop(-2) + outlist.pop() + item)

    if outlist and outlist[0] == "y":
        outlist.pop(0)
    if outlist and outlist[0] in ["=", "~"]:
        outlist.pop(0)

    for item in outlist:
        if ("[" in item) != ("]" in item):
            raise SyntaxError(
                "cannot nest operators in square brackets in formula input"
            )
        if item == "call":
            raise SyntaxError(
                "'call' cannot be used as a variable name in formula input"
            )
        if item in ["=", "~"]:
            raise SyntaxError("LHS in formula is not correctly specified")
    return outlist


def _parse_tokens(token_list):
    """Shunting-yard infix -> RPN (``formula.py:354-419``)."""
    assert isinstance(token_list, list), "input must be a list of strings"

    prev_op = True
    operator_stack = []
    output_list = []
    precedence = {"+": 2, "*": 3, "^": 4}
    l_assoc = {"+": True, "*": True, "^": False}

    for token in token_list:
        assert isinstance(token, str), "input must be a list of strings"
        if token in ["=", "~"]:
            raise SyntaxError("LHS in formula is not correctly specified")
        if token not in ["(", ")", "+", "*", "^"]:
            output_list.append(token)
            prev_op = False
        if token == "(" and not prev_op:
            operator_stack.append("call")
            prev_op = True
        if token in ["+", "*", "^"]:
            while (
                len(operator_stack) >= 1
                and operator_stack[-1] != "("
                and (
                    operator_stack[-1] == "call"
                    or precedence[operator_stack[-1]] > precedence[token]
                    or (
                        precedence[operator_stack[-1]] == precedence[token]
                        and l_assoc[token]
                    )
                )
            ):
                output_list.append(operator_stack.pop())
            operator_stack.append(token)
            prev_op = True
        if token == "(":
            operator_stack.append(token)
            prev_op = True
        if token == ")":
            while operator_stack and operator_stack[-1] != "(":
                output_list.append(operator_stack.pop())
            if not operator_stack:
                raise SyntaxError("string expression has mismatched parentheses")
            operator_stack.pop()
            prev_op = False

    while operator_stack:
        operator = operator_stack.pop()
        if operator in ["(", ")"]:
            raise SyntaxError("string expression has mismatched parentheses")
        output_list.append(operator)
    return output_list


def _eval_parsed_tokens(token_list, inputdict={}):
    """Evaluate the RPN token stream to a ``MeanBase``
    (``formula.py:420-495``)."""
    assert isinstance(token_list, list), "input must be a list of strings"

    op_list = ["+", "*", "^", "call"]
    stack = []

    for token in token_list:
        assert isinstance(token, str), "tokens must be strings"
        if token in ["=", "~"]:
            raise SyntaxError("LHS in formula is not correctly specified")
        if token not in op_list:
            stack.append("I" if token == "I" else _token_to_mean(token, inputdict))
            continue

        if len(stack) < 2:
            raise SyntaxError(
                "string expression is not a valid mathematical expression"
            )
        op_2 = stack.pop()
        if op_2 == "I":
            raise SyntaxError("identity operator can only be called as a function")
        op_1 = stack.pop()
        if token != "call" and op_1 == "I":
            raise SyntaxError("identity operator can only be called as a function")

        if token == "+":
            stack.append(op_1 + op_2)
        elif token == "*":
            stack.append(op_1 * op_2)
        elif token == "^":
            stack.append(op_1**op_2)
        elif token == "call":
            stack.append(op_2 if op_1 == "I" else op_1(op_2))

    if len(stack) != 1:
        raise SyntaxError("string expression is not a valid mathematical expression")
    return stack[0]
