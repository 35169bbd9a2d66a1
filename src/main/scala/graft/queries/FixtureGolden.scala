package graft.queries

/** Golden-literal DuckDB oracles for the fixture-driven extraction
  * queries. The reference's own test style is assert-on-observable-
  * output over its bundled fixtures (ETPTest.java:40-123 asserts
  * extracted text and MIME attributes on simple.pdf / simple.doc /
  * simple.docx / big.pdf), and those fixtures are immutable inputs —
  * so the strongest possible oracle is the full expected row set
  * itself, stated as a VALUES literal the driver hash-compares like
  * any other oracle. Generated from a verified run; any regression in
  * MIME detection, text extraction length, metadata parsing, entity
  * tagging, or schema inference flips the hash.
  */
object FixtureGolden {
  val extractFixtures: String =
    """SELECT * FROM (VALUES
      ('big.pdf', 'text/plain', 'application/pdf', 65599, CAST(NULL AS VARCHAR)),
      ('simple.doc', 'text/plain', 'application/msword', 931, CAST(NULL AS VARCHAR)),
      ('simple.docx', 'text/plain', 'application/vnd.openxmlformats-officedocument.wordprocessingml.document', 934, CAST(NULL AS VARCHAR)),
      ('simple.pdf', 'text/plain', 'application/pdf', 949, CAST(NULL AS VARCHAR))
    ) AS t(filename, mime_type, orig_mime_type, text_chars, error)
    ORDER BY filename"""

  val extractFixturesHtml: String =
    """SELECT * FROM (VALUES
      ('big.pdf', 'text/html', 97729),
      ('simple.doc', 'text/html', 1178),
      ('simple.docx', 'text/html', 1234),
      ('simple.pdf', 'text/html', 1285)
    ) AS t(filename, mime_type, html_chars)
    ORDER BY filename"""

  val extractMetadata: String =
    """SELECT * FROM (VALUES
      ('big.pdf', 'Content-Length', '905553'),
      ('big.pdf', 'Content-Type', 'application/pdf'),
      ('big.pdf', 'CreationDate', 'D:20161219125302-08''00'''),
      ('big.pdf', 'Creator', 'Cloud API Docs Plugin'),
      ('big.pdf', 'Producer', 'Apache FOP Version 1.0'),
      ('big.pdf', 'Title', 'Hortonworks DataFlow - Getting Started'),
      ('simple.doc', 'AppName', 'Microsoft Macintosh Word'),
      ('simple.doc', 'AppVersion', '983040'),
      ('simple.doc', 'Cfb-Streams', '1Table,CompObj,DocumentSummaryInformation,SummaryInformation,WordDocument'),
      ('simple.doc', 'CharCount', '795'),
      ('simple.doc', 'CharCountWithSpaces', '933'),
      ('simple.doc', 'Content-Length', '24064'),
      ('simple.doc', 'Content-Type', 'application/msword'),
      ('simple.doc', 'CreateDtm', '2049-02-20T22:17:00Z'),
      ('simple.doc', 'HyperlinksChanged', 'false'),
      ('simple.doc', 'LastAuthor', 'Willy Demis'),
      ('simple.doc', 'LastSaveDtm', '2018-02-21T20:00:00Z'),
      ('simple.doc', 'LineCount', '6'),
      ('simple.doc', 'LinksUpToDate', 'false'),
      ('simple.doc', 'PageCount', '2'),
      ('simple.doc', 'ParCount', '1'),
      ('simple.doc', 'RevNumber', '2'),
      ('simple.doc', 'ScaleCrop', 'false'),
      ('simple.doc', 'SharedDoc', 'false'),
      ('simple.doc', 'Template', 'Normal.dotm'),
      ('simple.doc', 'WordCount', '139'),
      ('simple.docx', 'AppVersion', '15.0000'),
      ('simple.docx', 'Application', 'Microsoft Macintosh Word'),
      ('simple.docx', 'Characters', '797'),
      ('simple.docx', 'CharactersWithSpaces', '935'),
      ('simple.docx', 'Content-Length', '14871'),
      ('simple.docx', 'Content-Type', 'application/vnd.openxmlformats-officedocument.wordprocessingml.document'),
      ('simple.docx', 'DocSecurity', '0'),
      ('simple.docx', 'HyperlinksChanged', 'false'),
      ('simple.docx', 'Lines', '6'),
      ('simple.docx', 'LinksUpToDate', 'false'),
      ('simple.docx', 'Pages', '2'),
      ('simple.docx', 'Paragraphs', '1'),
      ('simple.docx', 'ScaleCrop', 'false'),
      ('simple.docx', 'SharedDoc', 'false'),
      ('simple.docx', 'Template', 'Normal.dotm'),
      ('simple.docx', 'TotalTime', '0'),
      ('simple.docx', 'Words', '139'),
      ('simple.docx', 'created', '2018-02-21T20:00:00Z'),
      ('simple.docx', 'lastModifiedBy', 'Willy Demis'),
      ('simple.docx', 'modified', '2018-02-21T20:00:00Z'),
      ('simple.docx', 'revision', '2'),
      ('simple.pdf', 'Content-Length', '3028'),
      ('simple.pdf', 'Content-Type', 'application/pdf'),
      ('simple.pdf', 'CreationDate', 'D:20060301072826'),
      ('simple.pdf', 'Creator', 'Rave (http://www.nevrona.com/rave)'),
      ('simple.pdf', 'Producer', 'Nevrona Designs')
    ) AS t(filename, "key", "value")
    ORDER BY filename, "key""""

  /** Synthetic legacy .xls/.ppt fixtures (LegacyOffice — deterministic
    * bytes, see LegacyOfficeSpec): the full extracted text is the
    * golden. DuckDB e'' escape strings carry the tab/newline cell
    * separators. */
  val extractLegacy: String =
    """SELECT * FROM (VALUES
      ('cid.pdf', 'text/plain', 'application/pdf',
       'CID text recovered via font cmap.'),
      ('legacy.ppt', 'text/plain', 'application/vnd.ms-powerpoint',
       e'Legacy Deck\nFirst point\nSecond point'),
      ('legacy.xls', 'text/plain', 'application/vnd.ms-excel',
       e'Region\tRevenue\nnorth\t1500.25\nsouth\t42\n7\t8\ncafé π note'),
      ('pieced.doc', 'text/plain', 'application/msword',
       e'Fast-saved pieces survive.\nμ unicode πiece tail piece.'),
      ('secured_aes.pdf', 'text/plain', 'application/pdf',
       'Secured payload: AES-V2 stream decrypted.'),
      ('secured_aes256.pdf', 'text/plain', 'application/pdf',
       'Secured payload: AES-256 V5 stream decrypted.'),
      ('secured_rc4.pdf', 'text/plain', 'application/pdf',
       'Secured payload: RC4 stream decrypted.')
    ) AS t(filename, mime_type, orig_mime_type, text)
    ORDER BY filename"""

  /** Image fixtures (MediaFixtures): planted EXIF/tEXt values and
    * encoder-deterministic dimensions; Content-Length filtered out by
    * the query's own key filter. */
  val extractMediaMetadata: String =
    """SELECT * FROM (VALUES
      ('anim.gif', 'Content-Type', 'image/gif'),
      ('anim.gif', 'Image-Height', '5'),
      ('anim.gif', 'Image-Width', '11'),
      ('chart.png', 'Bit-Depth', '8'),
      ('chart.png', 'Color-Type', '2'),
      ('chart.png', 'Content-Type', 'image/png'),
      ('chart.png', 'Image-Height', '7'),
      ('chart.png', 'Image-Width', '9'),
      ('chart.png', 'tEXt:Author', 'graft'),
      ('chart.png', 'tEXt:Title', 'Quarterly Chart'),
      ('clip.mp4', 'Codecs', 'avc1,mp4a'),
      ('clip.mp4', 'Content-Type', 'video/mp4'),
      ('clip.mp4', 'Duration-Ms', '1007'),
      ('clip.mp4', 'Image-Height', '272'),
      ('clip.mp4', 'Image-Width', '432'),
      ('clip.mp4', 'Track-Count', '2'),
      ('photo.jpg', 'Content-Type', 'image/jpeg'),
      ('song.mp3', 'Album', 'Synthetic Sounds'),
      ('song.mp3', 'Artist', 'The Graftones'),
      ('song.mp3', 'Bitrate', '128000'),
      ('song.mp3', 'Channels', '2'),
      ('song.mp3', 'Content-Type', 'audio/mpeg'),
      ('song.mp3', 'Duration-Ms', '992'),
      ('song.mp3', 'Layer', '3'),
      ('song.mp3', 'MPEG-Version', '1'),
      ('song.mp3', 'Sample-Rate', '44100'),
      ('song.mp3', 'Title', 'Graft Anthem'),
      ('song.mp3', 'Year', '2024'),
      ('photo.jpg', 'DateTime', '2024:05:06 07:08:09'),
      ('photo.jpg', 'DateTimeOriginal', '2024:05:06 07:08:01'),
      ('photo.jpg', 'Image-Height', '6'),
      ('photo.jpg', 'Image-Width', '8'),
      ('photo.jpg', 'Make', 'GraftCam'),
      ('photo.jpg', 'Model', 'GC-100'),
      ('photo.jpg', 'Orientation', '6'),
      ('tone.wav', 'Bits-Per-Sample', '16'),
      ('tone.wav', 'Channels', '1'),
      ('tone.wav', 'Content-Type', 'audio/vnd.wave'),
      ('tone.wav', 'Duration-Ms', '500'),
      ('tone.wav', 'Sample-Rate', '8000')
    ) AS t(filename, "key", "value")
    ORDER BY filename, "key""""

  val entitiesFixtures: String =
    """SELECT "entity", CAST(n AS BIGINT) AS n FROM (VALUES
      ('FlowFile', 90),
      ('NiFi', 56),
      ('Processor', 56),
      ('This', 44),
      ('The', 40),
      ('Attributes', 39),
      ('FlowFiles', 28),
      ('Processors', 21),
      ('And', 19),
      ('Expression Language', 19),
      ('For', 17),
      ('To', 15),
      ('We', 15),
      ('Attribute', 13),
      ('If', 13),
      ('This Processor', 13),
      ('In', 10),
      ('HTTP', 9),
      ('Properties', 9),
      ('It', 8),
      ('Relationship', 8),
      ('Sends', 7),
      ('Apache NiFi', 6),
      ('Boring', 6),
      ('Downloads', 6),
      ('More', 6),
      ('Relationships', 6),
      ('XML', 6),
      ('As', 5),
      ('HDFS', 5),
      ('Source Processor', 5),
      ('These', 5),
      ('Configure', 4),
      ('Connection', 4),
      ('Content', 4),
      ('Executes', 4),
      ('GetFile', 4),
      ('HTTPS', 4),
      ('Hortonworks', 4),
      ('JSON', 4),
      ('Performs', 4),
      ('Provenance', 4),
      ('SQS', 4),
      ('UI', 4),
      ('User', 4),
      ('Additionally', 3),
      ('Available', 3),
      ('But', 3),
      ('By', 3),
      ('Clicking', 3),
      ('Continued', 3),
      ('Controller Service', 3),
      ('Data Provenance', 3),
      ('Each FlowFile', 3),
      ('Even', 3),
      ('Fetches', 3),
      ('FlowFile Content', 3),
      ('From', 3),
      ('GetFile Processor', 3),
      ('Global Menu', 3),
      ('Help', 3),
      ('Homebrew', 3),
      ('JMS', 3),
      ('Mac OS', 3),
      ('Oh', 3),
      ('On', 3),
      ('Property', 3),
      ('Property Values', 3),
      ('Routing', 3),
      ('SOHFy', 3),
      ('SQL', 3),
      ('Settings', 3),
      ('Site', 3),
      ('StdOut', 3),
      ('The Processor', 3),
      ('UPDATE', 3),
      ('User Data', 3),
      ('User Interface', 3),
      ('Using Attributes', 3),
      ('Virtual Mechanics', 3),
      ('While', 3),
      ('XML Content', 3),
      ('Yet', 3)
    ) AS t("entity", n)
    ORDER BY n DESC, "entity""""

  val inferSchema: String =
    """SELECT '{
  "type" : "record",
  "name" : "PDF",
  "namespace" : "graft",
  "fields" : [ {
    "name" : "doc_id",
    "type" : [ "null", "long" ],
    "default" : null
  }, {
    "name" : "lang",
    "type" : [ "null", "string" ],
    "default" : null
  }, {
    "name" : "sentiment",
    "type" : [ "null", "string" ],
    "default" : null
  } ]
}' AS avro_schema"""
}
