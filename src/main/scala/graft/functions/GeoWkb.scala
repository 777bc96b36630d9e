package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}

/** WKB (well-known binary) geometry surface — the reference parses/emits WKB
  * alongside WKT and GeoJSON (/root/reference/libs/geo/wkb.cpp). Points get
  * native codegen'd encode/decode expressions (registered as `st_aswkb`,
  * `st_wkb_x`, `st_wkb_y` by GraftExtensions — a binary column scan decodes
  * inside whole-stage codegen, no UDF); polygons get driver-side
  * encode/decode for constants and index planning, mirroring how polygon
  * literals are planned once (Geo.polygonLit).
  *
  * Layout (OGC 99-049): byte order flag (0 = XDR/big, 1 = NDR/little),
  * uint32 geometry type, then payload. Point = flag + type(1) + x + y =
  * 21 bytes. Polygon = flag + type(3) + numRings + per ring (numPoints +
  * points). Encoders always emit NDR; decoders honor either flag.
  */
object GeoWkb {

  /** Decode x (ordinal 0) or y (1) of a WKB POINT; null on malformed input
    * or a non-point geometry. */
  def pointCoord(b: Array[Byte], ordinal: Int): java.lang.Double = {
    if (b == null || b.length != 21 || (b(0) != 0 && b(0) != 1)) return null
    val buf = ByteBuffer.wrap(b).order(
      if (b(0) == 1) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
    if (buf.getInt(1) != 1) null
    else java.lang.Double.valueOf(buf.getDouble(5 + ordinal * 8))
  }

  def encodePoint(x: Double, y: Double): Array[Byte] = {
    val buf = ByteBuffer.allocate(21).order(ByteOrder.LITTLE_ENDIAN)
    buf.put(1: Byte).putInt(1).putDouble(x).putDouble(y)
    buf.array()
  }

  /** NDR WKB POLYGON with a single (outer) ring; the ring is written as
    * given — close it (first == last vertex) per OGC before calling. */
  def encodePolygon(ring: Seq[(Double, Double)]): Array[Byte] = {
    val buf = ByteBuffer.allocate(9 + 4 + ring.size * 16)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put(1: Byte).putInt(3).putInt(1).putInt(ring.size)
    ring.foreach { case (x, y) => buf.putDouble(x).putDouble(y) }
    buf.array()
  }

  /** Outer ring of a WKB POLYGON (either byte order); inner rings (holes)
    * are ignored, matching Geo.stPolygonOuter's documented WKT semantics. */
  def decodePolygonOuter(b: Array[Byte]): Seq[(Double, Double)] = {
    require(b != null && b.length >= 9 && (b(0) == 0 || b(0) == 1),
      "not a WKB value")
    val buf = ByteBuffer.wrap(b).order(
      if (b(0) == 1) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
    buf.position(1)
    val tpe = buf.getInt
    require(tpe == 3, s"not a WKB POLYGON (type $tpe)")
    val nRings = buf.getInt
    require(nRings >= 1, "POLYGON with no rings")
    val n = buf.getInt
    (0 until n).map(_ => (buf.getDouble, buf.getDouble))
  }

  /** (name, info, builder) triples for SparkSessionExtensions.injectFunction. */
  def functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("st_aswkb"),
      new ExpressionInfo(classOf[WkbPointExpr].getName, "st_aswkb"),
      (args: Seq[Expression]) => WkbPointExpr(args(0), args(1))),
    (FunctionIdentifier("st_wkb_x"),
      new ExpressionInfo(classOf[WkbCoordExpr].getName, "st_wkb_x"),
      (args: Seq[Expression]) => WkbCoordExpr(args(0), 0)),
    (FunctionIdentifier("st_wkb_y"),
      new ExpressionInfo(classOf[WkbCoordExpr].getName, "st_wkb_y"),
      (args: Seq[Expression]) => WkbCoordExpr(args(0), 1)))
}

/** st_aswkb(lon, lat) → 21-byte NDR WKB POINT. */
case class WkbPointExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == DoubleType && right.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"st_aswkb expects (DOUBLE, DOUBLE), got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")

  protected override def nullSafeEval(x: Any, y: Any): Any =
    GeoWkb.encodePoint(x.asInstanceOf[Double], y.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.functions.GeoWkb.encodePoint($x, $y);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** st_wkb_x / st_wkb_y — WKB POINT coordinate decode, either byte order;
  * null for malformed bytes or non-point geometries (decode is the hot scan
  * direction, so the codegen path is branchy-but-allocation-free). */
case class WkbCoordExpr(child: Expression, ordinal: Int) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"st_wkb_${if (ordinal == 0) "x" else "y"} expects BINARY, " +
        s"got ${child.dataType.simpleString}")

  protected override def nullSafeEval(input: Any): Any =
    GeoWkb.pointCoord(input.asInstanceOf[Array[Byte]], ordinal)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val buf = ctx.freshName("buf")
      s"""
         |if ($b.length == 21 && ($b[0] == 0 || $b[0] == 1)) {
         |  java.nio.ByteBuffer $buf = java.nio.ByteBuffer.wrap($b).order(
         |    $b[0] == 1 ? java.nio.ByteOrder.LITTLE_ENDIAN : java.nio.ByteOrder.BIG_ENDIAN);
         |  if ($buf.getInt(1) == 1) {
         |    ${ev.value} = $buf.getDouble(${5 + ordinal * 8});
         |  } else {
         |    ${ev.isNull} = true;
         |  }
         |} else {
         |  ${ev.isNull} = true;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
