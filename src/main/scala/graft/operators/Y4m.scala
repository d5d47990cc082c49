package graft.operators

/** YUV4MPEG2 (.y4m) — the raw planar-video interchange format every
  * codec toolchain (ffmpeg, x264, VMAF, dataset decoders) pipes
  * through; the natural landing format once [[H264]]/[[Multimodal]]
  * decode frames. Entirely textual-header + raw planes, closed-form
  * both directions: `YUV4MPEG2 W… H… F…:… [Ip] [A…:…] [C…]\n`, then
  * per frame `FRAME[ params]\n` + the planar payload. Supported
  * colorspaces and their per-frame sizes: C420/C420jpeg/C420paldv/
  * C420mpeg2 (all share the 4:2:0 layout — w·h + 2·⌈w/2⌉·⌈h/2⌉),
  * C422 (w·h + 2·⌈w/2⌉·h), C444 (3·w·h), Cmono (w·h). Unknown
  * colorspaces, missing/zero dims, short frames, or a frame count
  * beyond the bomb cap reject (None) — drop, never invent. Frame
  * parameters (X…) are preserved opaque, per spec. No reference
  * analogue (north-star multimodal surface); validated by exact
  * round trips + hand-pinned headers + fuzz in Y4mSpec and the
  * scene-readout gate query. */
object Y4m {

  /** `.y4m` sniff. */
  def isY4m(b: Array[Byte]): Boolean = {
    val magic = "YUV4MPEG2 "
    b.length >= magic.length &&
      magic.indices.forall(i => b(i) == magic.charAt(i).toByte)
  }

  final case class Y4mHeader(w: Int, h: Int, fpsNum: Int, fpsDen: Int,
      interlace: String, aspect: String, colorspace: String)

  final case class Y4mFrame(params: String, planes: Array[Byte])

  /** Bytes per frame for a supported colorspace; None if unknown. */
  def frameSize(w: Int, h: Int, colorspace: String): Option[Int] = {
    val cw = (w + 1) / 2
    val ch = (h + 1) / 2
    colorspace match {
      case "420" | "420jpeg" | "420paldv" | "420mpeg2" =>
        Some(w * h + 2 * cw * ch)
      case "422"  => Some(w * h + 2 * cw * h)
      case "444"  => Some(3 * w * h)
      case "mono" => Some(w * h)
      case _      => None
    }
  }

  /** Serialize a stream. `frames` are pre-sized planar payloads (the
    * builder checks each against the header's frame size). */
  def build(hdr: Y4mHeader, frames: Seq[Y4mFrame]): Array[Byte] = {
    val fs = frameSize(hdr.w, hdr.h, hdr.colorspace)
      .getOrElse(sys.error(s"unsupported colorspace ${hdr.colorspace}"))
    val out = new java.io.ByteArrayOutputStream()
    val head = new StringBuilder(s"YUV4MPEG2 W${hdr.w} H${hdr.h} ")
    head.append(s"F${hdr.fpsNum}:${hdr.fpsDen}")
    if (hdr.interlace.nonEmpty) head.append(s" I${hdr.interlace}")
    if (hdr.aspect.nonEmpty) head.append(s" A${hdr.aspect}")
    head.append(s" C${hdr.colorspace}")
    head.append('\n')
    out.write(head.toString.getBytes("US-ASCII"))
    frames.foreach { f =>
      require(f.planes.length == fs,
        s"frame payload ${f.planes.length} != $fs for C${hdr.colorspace}")
      val fh = if (f.params.isEmpty) "FRAME\n" else s"FRAME ${f.params}\n"
      out.write(fh.getBytes("US-ASCII"))
      out.write(f.planes)
    }
    out.toByteArray
  }

  /** Parse a stream: header + every frame, verifying sizes. None on
    * any malformation or more than `maxFrames` frames. */
  def parse(data: Array[Byte], maxFrames: Int = 4096)
      : Option[(Y4mHeader, Seq[Y4mFrame])] = {
    if (!isY4m(data)) return None
    var nl = 10 // header starts after "YUV4MPEG2 "
    while (nl < data.length && data(nl) != '\n') nl += 1
    if (nl >= data.length || nl > 1024) return None // header line cap
    val headLine = new String(data, 10, nl - 10, "US-ASCII")
    var w = -1; var h = -1; var fn = 30; var fd = 1
    var il = ""; var asp = ""; var cs = "420jpeg" // spec default
    for (tok <- headLine.split(' ') if tok.nonEmpty) tok.charAt(0) match {
      case 'W' => w = tok.drop(1).toIntOption.getOrElse(-1)
      case 'H' => h = tok.drop(1).toIntOption.getOrElse(-1)
      case 'F' => tok.drop(1).split(':') match {
        case Array(a, b) =>
          fn = a.toIntOption.getOrElse(-1); fd = b.toIntOption.getOrElse(-1)
        case _ => fn = -1
      }
      case 'I' => il = tok.drop(1)
      case 'A' => asp = tok.drop(1)
      case 'C' => cs = tok.drop(1)
      case 'X' => // application extension: opaque, per spec
      case _   => return None
    }
    if (w < 1 || h < 1 || fn < 1 || fd < 1 || w.toLong * h > (1L << 24))
      return None
    val fs = frameSize(w, h, cs).getOrElse(return None)
    val hdr = Y4mHeader(w, h, fn, fd, il, asp, cs)
    val frames = Seq.newBuilder[Y4mFrame]
    var p = nl + 1
    var count = 0
    while (p < data.length) {
      // "FRAME" [params] "\n"
      if (p + 5 > data.length ||
        !"FRAME".indices.forall(i => data(p + i) == "FRAME".charAt(i).toByte))
        return None
      var q = p + 5
      while (q < data.length && data(q) != '\n') q += 1
      if (q >= data.length) return None
      val params = new String(data, p + 5, q - (p + 5), "US-ASCII").trim
      if (q + 1 + fs > data.length) return None // short frame
      frames += Y4mFrame(params,
        java.util.Arrays.copyOfRange(data, q + 1, q + 1 + fs))
      p = q + 1 + fs
      count += 1
      if (count > maxFrames) return None
    }
    Some((hdr, frames.result()))
  }
}
