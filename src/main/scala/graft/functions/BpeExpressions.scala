package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Whole-document BPE encode as ONE native codegen expression — the
  * tokenizer hot path ([[graft.operators.TextOps.bpeEncodeWithMerges]]).
  *
  * The composable form (kept as the executable spec,
  * `TextOps.bpeEncodeColumns`) runs `flatten(transform(tk, w => fold of
  * nMerges replace()s))` + a second per-token `transform` for the md5-48
  * ids: every lambda evaluates interpreted (HOFs don't codegen), each
  * `replace` allocates an intermediate string per word occurrence, and the
  * md5 detours through a Column tree per token. Measured at sf0.1 that
  * interpretation dominated the two encode queries (~4.5 s each) and the
  * decode round-trip that contains an encode (~6-7 s). This expression
  * fuses the whole per-document pipeline — char split, merge folds, token
  * split, hash — into a single primitive loop that splices into
  * whole-stage codegen, calling the SAME UTF8String kernels the built-in
  * expressions use (`split`, `concatWs`, `replace`, `substringSQL`), so
  * the output is bit-identical to the composable form by construction
  * (TextOpsSpec pins ≡ on the corpus).
  *
  * Output: struct(n_tokens BIGINT, token_ids STRING) — the id sequence
  * space-joined (the registry's stringified-array rule). Merges arrive as
  * pre-anchored (pattern, replacement) pairs in training order; a missing
  * step is the (" ", " ") no-op, exactly the scalar-subquery fallback of
  * the column form. */
case class BpeEncodeIds(child: Expression, pats: Seq[String],
                        reps: Seq[String], idBuckets: Long)
    extends UnaryExpression {
  require(pats.length == reps.length, "pats/reps must align")
  require(idBuckets > 0, "idBuckets must be positive")

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("token_ids", StringType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_encode_ids requires array<string> tokens, got $other")
  }

  @transient private lazy val patsU: Array[UTF8String] =
    pats.map(UTF8String.fromString).toArray
  @transient private lazy val repsU: Array[UTF8String] =
    reps.map(UTF8String.fromString).toArray

  override def nullSafeEval(input: Any): Any =
    BpeEncodeIds.compute(input.asInstanceOf[ArrayData], patsU, repsU, idBuckets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val p = ctx.addReferenceObj("bpePats", patsU,
      "org.apache.spark.unsafe.types.UTF8String[]")
    val r = ctx.addReferenceObj("bpeReps", repsU,
      "org.apache.spark.unsafe.types.UTF8String[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BpeEncodeIds.compute($c, $p, $r, ${idBuckets}L);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncodeIds =
    copy(child = newChild)
  override def prettyName: String = "bpe_encode_ids"
}

/** Token-id sequence → text as ONE native codegen expression — the decode
  * direction of [[BpeEncodeIds]] ([[graft.operators.TextOps.bpeDecode]]).
  * The composable form (kept as `TextOps.bpeDecodeColumnsHof`, the
  * executable spec) stages the vocabulary as a scalar-subquery MAP column
  * and runs `array_join(transform(split(ids), i => element_at(m, i)))` —
  * interpreted per id, with a map probe through the Column tree each time.
  * Here the id→symbol table (|alphabet| + nMerges entries — tokenizer
  * metadata, bounded at any corpus size) rides as a reference-object
  * HashMap and the loop splices into whole-stage codegen. Lookup misses
  * contribute nothing, exactly `array_join`'s null-skipping. */
case class BpeDecodeSyms(child: Expression, ids: Seq[String],
                         syms: Seq[String])
    extends UnaryExpression {
  require(ids.length == syms.length, "ids/syms must align")

  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_decode_syms requires a string id sequence, got $other")
  }

  @transient private lazy val table: java.util.HashMap[UTF8String, UTF8String] = {
    val m = new java.util.HashMap[UTF8String, UTF8String](ids.size * 2)
    ids.iterator.zip(syms.iterator).foreach { case (k, v) =>
      m.put(UTF8String.fromString(k), UTF8String.fromString(v))
    }
    m
  }

  override def nullSafeEval(input: Any): Any =
    BpeDecodeSyms.compute(input.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // raw type: janino's generics support is too limited (CountInSet's note)
    val t = ctx.addReferenceObj("bpeVocab", table, "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BpeDecodeSyms.compute($c, $t);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeDecodeSyms =
    copy(child = newChild)
  override def prettyName: String = "bpe_decode_syms"
}

object BpeDecodeSyms {
  private val Space = UTF8String.fromString(" ")

  /** Shared by interpreted eval and generated code. */
  def compute(idSeq: UTF8String,
              table: java.util.HashMap[UTF8String, UTF8String]): UTF8String = {
    val parts = idSeq.split(Space, -1)
    val out = new Array[UTF8String](parts.length)
    var n = 0
    var i = 0
    while (i < parts.length) {
      val sym = table.get(parts(i))
      if (sym != null) { out(n) = sym; n += 1 } // miss ≡ array_join null-skip
      i += 1
    }
    UTF8String.concat(java.util.Arrays.copyOf(out, n): _*)
  }
}

object BpeEncodeIds {
  private val Space = UTF8String.fromString(" ")
  private val EmptyPat = UTF8String.fromString("")

  /** Shared by interpreted eval and generated code. Every step calls the
    * UTF8String method the corresponding built-in expression calls, so the
    * fused loop cannot diverge from the composable Column form. */
  def compute(toks: ArrayData, pats: Array[UTF8String],
              reps: Array[UTF8String], idBuckets: Long): InternalRow = {
    val sb = new java.lang.StringBuilder
    var nTokens = 0L
    val nWords = toks.numElements()
    var i = 0
    while (i < nWords) {
      val w = toks.getUTF8String(i)
      // split(w, '') → chars; concat(' ', array_join(chars, ' ')) → anchor
      val chars = w.split(EmptyPat, -1)
      var syms = UTF8String.concat(Space, UTF8String.concatWs(Space, chars: _*))
      var m = 0
      while (m < pats.length) {
        syms = syms.replace(pats(m), reps(m))
        m += 1
      }
      // substr(2, length) → drop the anchor; split(' ') → final symbols
      val parts = syms.substringSQL(2, Integer.MAX_VALUE).split(Space, -1)
      var k = 0
      while (k < parts.length) {
        val id = Md5Hash48.compute(parts(k).getBytes) % idBuckets
        if (nTokens > 0L) sb.append(' ')
        sb.append(id)
        nTokens += 1L
        k += 1
      }
      i += 1
    }
    InternalRow(nTokens, UTF8String.fromString(sb.toString))
  }
}
